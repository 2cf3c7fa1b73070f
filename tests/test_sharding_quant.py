"""draft_quant under a mesh (jnp quant backend): sharded engines with a
quantized draft-weight copy must reproduce single-device outputs bit-exactly.
GSPMD partitions the dequant-dot like the dense dot (parallel/sharding.py
quant_param_pspecs / shard_quant_params)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdec_tpu import quantization as Q
from magicdec_tpu.config import tiny_config
from magicdec_tpu.engine.engine import EngineConfig, SpecEngine, LongSpecEngine
from magicdec_tpu.parallel import sharding as S
from tests.test_spec_parity import _random_params

CFG = tiny_config(vocab_size=128, n_layer=2, n_head=8, n_kv_head=4, dim=64,
                  intermediate_size=128)
PARAMS = _random_params(CFG, seed=5)


def _ecfg(**kw):
    base = dict(mode="streamingllm", gamma=3, draft_budget=33, max_seq_len=256,
                chunk_size=16, window_size=8, sink_size=4, max_gen=16,
                eot_ids=(-1,), cache_dtype=jnp.float32)
    base.update(kw)
    return EngineConfig(**base)


def _prompt(B, prefix, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, CFG.vocab_size, (B, prefix)), jnp.int32)


@pytest.mark.parametrize("bits", ["int8", "int4"])
def test_sharded_selfspec_draft_quant_matches_single_device(bits):
    assert len(jax.devices()) >= 8
    prompt = _prompt(4, 48)
    ecfg = _ecfg(draft_quant=bits)

    ref = SpecEngine(PARAMS, CFG, ecfg)
    st = ref.encode(prompt)
    _, ref_stats = ref.generate(st)

    mesh = S.make_mesh(data=2, model=4)
    tp = SpecEngine(PARAMS, CFG, ecfg, mesh=mesh)
    assert Q.is_quantized(tp._dq_params["layers"]["wq"])
    assert tp._dq_params["layers"]["wq"].q.sharding.spec[-1] is not None
    st = tp.encode(prompt)
    _, tp_stats = tp.generate(st)

    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))
    np.testing.assert_array_equal(np.asarray(ref_stats["num_committed"]),
                                  np.asarray(tp_stats["num_committed"]))


def test_sharded_longspec_draft_quant_matches_single_device():
    from tests.test_longspec import DRAFT_CFG, DRAFT_PARAMS

    prompt = _prompt(4, 48, seed=7)
    ecfg = _ecfg(mode="full", draft_quant="int8")

    ref = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg)
    st = ref.encode(prompt)
    _, ref_stats = ref.generate(st)

    # draft tiny-config has 2 kv heads -> model axis 2
    mesh = S.make_mesh(data=2, model=2)
    tp = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg, mesh=mesh)
    assert Q.is_quantized(tp.draft_params["layers"]["wq"])
    st = tp.encode(prompt)
    _, tp_stats = tp.generate(st)
    np.testing.assert_array_equal(np.asarray(ref_stats["output"]),
                                  np.asarray(tp_stats["output"]))


def test_mesh_draft_quant_requires_jnp_backend():
    Q.set_matmul_backend("pallas")
    try:
        with pytest.raises(NotImplementedError, match="jnp quant-matmul"):
            SpecEngine(PARAMS, CFG, _ecfg(draft_quant="int8"),
                       mesh=S.make_mesh(data=2, model=4))
    finally:
        Q.set_matmul_backend("jnp")
