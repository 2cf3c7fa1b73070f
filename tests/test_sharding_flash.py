"""Pallas hot path under a mesh (ops/shard.py shard_map wrappers).

The flash attention / in-place append kernels are opaque custom calls over the
stacked [L, B, S, K] cache — GSPMD cannot partition them, so engines under a
mesh wrap them per-shard via shard_map (batch on the data axis, whole kv heads
on the model axes).  This is the TPU equivalent of the reference's default
operating mode: flashinfer kernels under 8-way TP (Engine/tp.py:202-207 +
Engine/SnapKV/backend.py:42-115).

Gate: mesh flash outputs == single-device flash outputs token-for-token.
Shards own whole kv heads and S is unsharded, so per-head kernel arithmetic
(including the online-softmax block order) is identical on both sides.
Kernels run in interpret mode on the CPU mesh (ops/pallas.use_interpret).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdec_tpu.config import tiny_config
from magicdec_tpu.engine.engine import EngineConfig, LongSpecEngine, SpecEngine
from magicdec_tpu.parallel import sharding as S
from tests.test_spec_parity import _random_params

CFG = tiny_config(vocab_size=128, n_layer=2, n_head=8, n_kv_head=4, dim=64,
                  intermediate_size=128)
PARAMS = _random_params(CFG, seed=5)


def _ecfg(mode, **kw):
    base = dict(mode=mode, gamma=3, draft_budget=33, max_seq_len=256,
                chunk_size=16, window_size=8, sink_size=4, max_gen=16,
                eot_ids=(-1,), cache_dtype=jnp.float32, attn_backend="flash")
    base.update(kw)
    return EngineConfig(**base)


def _prompt(B, prefix, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, CFG.vocab_size, size=(B, prefix)), jnp.int32)


def _run(engine, prompt, rng=None):
    st = engine.encode(prompt, rng=rng)
    _, stats = engine.generate(st)
    return stats


@pytest.mark.parametrize("mode,kv_quant,model_axis", [
    ("streamingllm", False, 4),
    ("streamingllm", "int8", 4),
    ("streamingllm", "int4", 2),   # int4 head-pair packing: local heads even
    ("snapkv", False, 4),
    ("snapkv", "int8", 4),
])
def test_mesh_flash_spec_matches_single_device_flash(mode, kv_quant, model_axis):
    B, prefix = 4, 40 if mode == "snapkv" else 48
    prompt = _prompt(B, prefix)
    ecfg = _ecfg(mode, kv_quant=kv_quant)

    ref = SpecEngine(PARAMS, CFG, ecfg)
    ref_stats = _run(ref, prompt)

    mesh = S.make_mesh(data=2, model=model_axis)
    tp = SpecEngine(PARAMS, CFG, ecfg, mesh=mesh)
    from magicdec_tpu.ops.shard import FlashShard
    assert isinstance(tp._backend_t, FlashShard)
    tp_stats = _run(tp, prompt)

    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))
    np.testing.assert_array_equal(np.asarray(ref_stats["num_committed"]),
                                  np.asarray(tp_stats["num_committed"]))


def test_mesh_flash_baseline_matches_single_device_flash():
    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=3)
    ecfg = _ecfg("streamingllm", kv_quant="int8")
    ref = SpecEngine(PARAMS, CFG, ecfg)
    st = ref.encode_baseline(prompt)
    _, ref_stats = ref.generate_baseline(st, max_new=12)

    mesh = S.make_mesh(data=2, model=4)
    tp = SpecEngine(PARAMS, CFG, ecfg, mesh=mesh)
    st = tp.encode_baseline(prompt)
    _, tp_stats = tp.generate_baseline(st, max_new=12)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_mesh_flash_sampled_matches_single_device_flash():
    """Gumbel-coupled sampling (temperature > 0) under mesh + flash: the rng
    is replicated, salts are data-sharded; tokens must equal 1-device flash."""
    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=7)
    ecfg = _ecfg("streamingllm", temperature=0.8, top_p=0.9)
    key = jax.random.PRNGKey(11)

    ref = SpecEngine(PARAMS, CFG, ecfg)
    ref_stats = _run(ref, prompt, rng=key)

    mesh = S.make_mesh(data=2, model=4)
    tp = SpecEngine(PARAMS, CFG, ecfg, mesh=mesh)
    tp_stats = _run(tp, prompt, rng=key)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_mesh_flash_longspec_submesh_matches_single_device_flash():
    """Standalone draft on the inner model sub-axis, flash kernels on both the
    target's ("mo","mi") cache and the draft's ("mi",)-sharded cache."""
    from tests.test_longspec import DRAFT_CFG, DRAFT_PARAMS

    B, prefix = 4, 48
    ecfg = _ecfg("full")
    prompt = _prompt(B, prefix, seed=9)

    ref = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg)
    ref_stats = _run(ref, prompt)

    mesh = S.make_submesh_mesh(data=1, model_outer=2, model_inner=2)
    tp = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg, mesh=mesh)
    from magicdec_tpu.ops.shard import FlashShard
    assert tp._backend_t.axes == ("mo", "mi")
    assert tp._backend_d.axes == ("mi",)
    tp_stats = _run(tp, prompt)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_mesh_int4_kv_rejects_odd_local_heads():
    """4 kv heads / 4 model shards = 1 local head — int4 head-pair packing
    cannot split a pair across shards; the engine must refuse."""
    mesh = S.make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="int4"):
        SpecEngine(PARAMS, CFG, _ecfg("streamingllm", kv_quant="int4"),
                   mesh=mesh)


def test_mesh_int4_kv_quant_sharded_matches_single_device():
    """int4-packed cache under TP (jnp backend — kernel path covered above):
    VERDICT r1 item 9."""
    ecfg = _ecfg("streamingllm", kv_quant="int4", attn_backend="jnp")
    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=12)
    ref = SpecEngine(PARAMS, CFG, ecfg)
    ref_stats = _run(ref, prompt)

    mesh = S.make_mesh(data=2, model=2)
    tp = SpecEngine(PARAMS, CFG, ecfg, mesh=mesh)
    tp_stats = _run(tp, prompt)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_mesh_flash_padded_kv_heads_matches_single_device():
    """pad_heads_for_tp under the FLASH shard_map path: n_kv_head=2 on a
    4-way model axis pads to 4 zero-contribution heads — each shard then
    runs the flash kernels on exactly one (possibly all-padded) local head;
    outputs must equal the single-device flash run bit-for-bit."""
    pcfg = tiny_config(vocab_size=128, n_layer=2, n_head=8, n_kv_head=2,
                       dim=64, intermediate_size=128)
    pparams = _random_params(pcfg, seed=11)
    ecfg = _ecfg("streamingllm", attn_backend="flash")
    prompt = _prompt(4, 48, seed=13)

    ref_engine = SpecEngine(pparams, pcfg, ecfg)
    st = ref_engine.encode(prompt)
    _, ref_stats = ref_engine.generate(st)

    mesh = S.make_mesh(data=2, model=4)
    tp_engine = SpecEngine(pparams, pcfg, ecfg, mesh=mesh)
    assert tp_engine.cfg.n_kv_head == 4
    st = tp_engine.encode(prompt)
    _, tp_stats = tp_engine.generate(st)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))
