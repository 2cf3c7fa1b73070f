"""M4 gate: GSPMD tensor-parallel execution on a virtual 8-device CPU mesh
must produce the same tokens as single-device execution (SURVEY.md §7).

This replaces the reference's untestable NCCL path (SURVEY.md §4: no fake
distributed backend) with a real multi-device run on the CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdec_tpu.config import tiny_config
from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
from magicdec_tpu.parallel import sharding as S
from tests.test_spec_parity import _random_params

CFG = tiny_config(vocab_size=128, n_layer=2, n_head=8, n_kv_head=4, dim=64,
                  intermediate_size=128)
PARAMS = _random_params(CFG, seed=5)


def _ecfg(mode):
    return EngineConfig(mode=mode, gamma=3, draft_budget=33, max_seq_len=256,
                        chunk_size=16, window_size=8, sink_size=4, max_gen=16,
                        eot_ids=(-1,), cache_dtype=jnp.float32)


def _prompt(B, prefix, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, CFG.vocab_size, size=(B, prefix)), jnp.int32)


def test_mesh_construction_and_validation():
    mesh = S.make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    S.validate_mesh(CFG, mesh)
    bad = tiny_config(n_head=6, n_kv_head=3, dim=48)
    with pytest.raises(ValueError):
        S.validate_mesh(bad, mesh)


@pytest.mark.parametrize("mode", ["streamingllm", "snapkv"])
def test_sharded_spec_matches_single_device(mode):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    B, prefix = 4, 40 if mode == "snapkv" else 48
    prompt = _prompt(B, prefix)

    ref_engine = SpecEngine(PARAMS, CFG, _ecfg(mode))
    st = ref_engine.encode(prompt)
    _, ref_stats = ref_engine.generate(st)

    mesh = S.make_mesh(data=2, model=4)
    tp_engine = SpecEngine(PARAMS, CFG, _ecfg(mode), mesh=mesh)
    st = tp_engine.encode(prompt)
    _, tp_stats = tp_engine.generate(st)

    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))
    np.testing.assert_array_equal(np.asarray(ref_stats["num_committed"]),
                                  np.asarray(tp_stats["num_committed"]))


def test_sharded_baseline_matches_single_device():
    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=3)
    ref_engine = SpecEngine(PARAMS, CFG, _ecfg("streamingllm"))
    st = ref_engine.encode_baseline(prompt)
    _, ref = ref_engine.generate_baseline(st, max_new=12)

    mesh = S.make_mesh(data=2, model=4)
    tp_engine = SpecEngine(PARAMS, CFG, _ecfg("streamingllm"), mesh=mesh)
    st = tp_engine.encode_baseline(prompt)
    _, tp = tp_engine.generate_baseline(st, max_new=12)
    np.testing.assert_array_equal(np.asarray(ref["output"]), np.asarray(tp["output"]))


def test_param_shardings_cover_all_leaves():
    mesh = S.make_mesh(data=2, model=4)
    sharded = S.shard_params(PARAMS, CFG, mesh)
    flat, _ = jax.tree.flatten(sharded)
    for leaf in flat:
        assert hasattr(leaf, "sharding")


def test_longspec_draft_submesh_matches_single_device():
    """Reference mode 4 (SURVEY §2.3): target TP over the full model axes,
    draft TP over the inner sub-axis only — outputs must equal 1-device."""
    from magicdec_tpu.engine.engine import LongSpecEngine
    from tests.test_longspec import DRAFT_CFG, DRAFT_PARAMS

    B, prefix, max_gen = 4, 48, 12
    ecfg = _ecfg("full")
    prompt = _prompt(B, prefix, seed=9)

    ref = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg)
    st = ref.encode(prompt)
    _, ref_stats = ref.generate(st)

    mesh = S.make_submesh_mesh(data=1, model_outer=2, model_inner=2)
    assert S.model_axes_of(mesh) == ("mo", "mi")
    assert S.draft_axes_of(mesh) == ("mi",)
    tp = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg, mesh=mesh)
    st = tp.encode(prompt)
    _, tp_stats = tp.generate(st)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_hybrid_mesh_engine_matches_single_device():
    """multihost.make_hybrid_mesh (DCN-major data x ICI model) is just a Mesh;
    on the 8-device CPU fake it must reproduce single-device outputs and
    reject layouts whose model axis would span hosts."""
    from magicdec_tpu.parallel import multihost as MH

    mesh = MH.make_hybrid_mesh(model_axis=4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        MH.make_hybrid_mesh(model_axis=3)

    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=11)
    ref = SpecEngine(PARAMS, CFG, _ecfg("streamingllm"))
    _, ref_stats = ref.generate(ref.encode(prompt))
    tp = SpecEngine(PARAMS, CFG, _ecfg("streamingllm"), mesh=mesh)
    _, tp_stats = tp.generate(tp.encode(prompt))
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_kv_quant_sharded_matches_single_device():
    """int8 target cache under TP: the scale planes [L, B, Hkv, S] shard on
    the kv-head axis alongside the cache; outputs must equal 1-device."""
    import dataclasses

    ecfg = dataclasses.replace(_ecfg("streamingllm"), kv_quant=True)
    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=12)
    ref = SpecEngine(PARAMS, CFG, ecfg)
    _, ref_stats = ref.generate(ref.encode(prompt))

    mesh = S.make_mesh(data=2, model=4)
    tp = SpecEngine(PARAMS, CFG, ecfg, mesh=mesh)
    st = tp.encode(prompt)
    assert st.ks is not None and hasattr(st.ks, "sharding")
    _, tp_stats = tp.generate(st)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_padded_kv_heads_tp_matches_single_device():
    """Non-divisible kv-head TP (VERDICT r4 item 3): n_kv_head=2 on a 4-way
    model axis pads to 4 zero-contribution kv heads (S.pad_heads_for_tp —
    the GSPMD equivalent of the reference's uneven round-robin split,
    Engine/tp.py:36-52) and must reproduce single-device outputs bit-exactly.
    """
    pcfg = tiny_config(vocab_size=128, n_layer=2, n_head=8, n_kv_head=2,
                       dim=64, intermediate_size=128)
    pparams = _random_params(pcfg, seed=9)
    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=7)

    ref_engine = SpecEngine(pparams, pcfg, _ecfg("streamingllm"))
    st = ref_engine.encode(prompt)
    _, ref_stats = ref_engine.generate(st)
    bst = ref_engine.encode_baseline(prompt)
    _, ref_base = ref_engine.generate_baseline(bst, max_new=12)

    mesh = S.make_mesh(data=2, model=4)
    tp_engine = SpecEngine(pparams, pcfg, _ecfg("streamingllm"), mesh=mesh)
    assert tp_engine.cfg.n_kv_head == 4 and tp_engine.cfg.n_head == 16
    assert tp_engine.cfg.head_dim == pcfg.head_dim  # not dim // n_head
    st = tp_engine.encode(prompt)
    _, tp_stats = tp_engine.generate(st)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))
    np.testing.assert_array_equal(np.asarray(ref_stats["num_committed"]),
                                  np.asarray(tp_stats["num_committed"]))
    bst = tp_engine.encode_baseline(prompt)
    _, tp_base = tp_engine.generate_baseline(bst, max_new=12)
    np.testing.assert_array_equal(np.asarray(ref_base["output"]),
                                  np.asarray(tp_base["output"]))


def test_padded_kv_heads_quantized_draft():
    """pad_heads_for_tp on int8 per-channel quantized leaves: a padded
    quantized DRAFT copy (draft_quant under a mesh, jnp backend) still
    commits exactly the full-precision target's greedy output."""
    pcfg = tiny_config(vocab_size=128, n_layer=2, n_head=8, n_kv_head=2,
                       dim=64, intermediate_size=128)
    pparams = _random_params(pcfg, seed=9)
    B, prefix = 4, 48
    prompt = _prompt(B, prefix, seed=7)
    ref_engine = SpecEngine(pparams, pcfg, _ecfg("streamingllm"))
    bst = ref_engine.encode_baseline(prompt)
    _, ref_base = ref_engine.generate_baseline(bst, max_new=12)

    mesh = S.make_mesh(data=2, model=4)
    import dataclasses
    ecfg = dataclasses.replace(_ecfg("streamingllm"), draft_quant="int8")
    tp_engine = SpecEngine(pparams, pcfg, ecfg, mesh=mesh)
    st = tp_engine.encode(prompt)
    _, stats = tp_engine.generate(st)
    out = np.asarray(stats["output"])
    ref = np.asarray(ref_base["output"])
    n = np.asarray(stats["num_committed"])
    for b in range(B):
        m = min(int(n[b]), 12)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])
