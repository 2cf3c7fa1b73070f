"""Fused execution weights (models.llama.fuse_exec_params): one QKV dot and
one gate/up dot must be BIT-identical to the separate dots (a dot's output
columns contract independently), for dense, biased (Qwen qkv_bias), and
quantized weights; quantize-then-fuse == fuse-then-quantize (per-output-column
scales are oblivious to concatenation)."""

import numpy as np

import jax
import jax.numpy as jnp

from magicdec_tpu import quantization as Q
from magicdec_tpu.config import tiny_config
from magicdec_tpu.models import llama as M

CFG = tiny_config(vocab_size=128, n_layer=2, n_head=4, n_kv_head=2, dim=64,
                  intermediate_size=128, qkv_bias=True)


def _params(cfg, seed=0):
    rng = np.random.RandomState(seed)

    def w(*shape, scale=0.1):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

    L, D, F = cfg.n_layer, cfg.dim, cfg.intermediate_size
    layers = {
        "wq": w(L, D, cfg.n_head * cfg.head_dim),
        "wk": w(L, D, cfg.n_kv_head * cfg.head_dim),
        "wv": w(L, D, cfg.n_kv_head * cfg.head_dim),
        "bq": w(L, cfg.n_head * cfg.head_dim),
        "bk": w(L, cfg.n_kv_head * cfg.head_dim),
        "bv": w(L, cfg.n_kv_head * cfg.head_dim),
        "wo": w(L, cfg.n_head * cfg.head_dim, D),
        "w1": w(L, D, F), "w3": w(L, D, F), "w2": w(L, F, D),
        "attn_norm": jnp.ones((L, D)), "ffn_norm": jnp.ones((L, D)),
    }
    return {"embed": w(cfg.vocab_size, D, scale=0.05), "layers": layers,
            "final_norm": jnp.ones((D,)), "lm_head": w(D, cfg.vocab_size)}


def _forward(params, tokens, lens, S=64):
    shape = (CFG.n_layer, tokens.shape[0], S, CFG.n_kv_head * CFG.head_dim)
    caches = {"k": jnp.zeros(shape, jnp.float32),
              "v": jnp.zeros(shape, jnp.float32)}
    logits, caches = M.forward_target(params, CFG, tokens, lens, caches,
                                      return_logits=True)
    return np.asarray(logits), caches


def test_fused_dense_bitwise():
    params = _params(CFG)
    fused = M.fuse_exec_params(params, CFG)
    assert fused["layers"].get("wq") is None
    assert fused["layers"]["wqkv"].shape[-1] == (CFG.n_head
                                                 + 2 * CFG.n_kv_head) * CFG.head_dim
    rng = np.random.RandomState(1)
    tokens = jnp.asarray(rng.randint(0, 128, (2, 5)), jnp.int32)
    lens = jnp.asarray([3, 0], jnp.int32)
    ref, cr = _forward(params, tokens, lens)
    out, cf = _forward(fused, tokens, lens)
    np.testing.assert_array_equal(ref, out)
    np.testing.assert_array_equal(np.asarray(cr["k"]), np.asarray(cf["k"]))
    # idempotent
    assert M.fuse_exec_params(fused, CFG) is fused


def test_fused_quantized_both_orders():
    params = _params(CFG)
    for bits in (8, 4):
        qf = M.fuse_exec_params(Q.quantize_params(params, bits=bits), CFG)
        fq = Q.quantize_params(M.fuse_exec_params(params, CFG), bits=bits)
        np.testing.assert_array_equal(np.asarray(qf["layers"]["wqkv"].q),
                                      np.asarray(fq["layers"]["wqkv"].q))
        np.testing.assert_array_equal(np.asarray(qf["layers"]["w13"].scale),
                                      np.asarray(fq["layers"]["w13"].scale))
        rng = np.random.RandomState(2)
        tokens = jnp.asarray(rng.randint(0, 128, (2, 4)), jnp.int32)
        lens = jnp.zeros((2,), jnp.int32)
        a, _ = _forward(qf, tokens, lens)
        b, _ = _forward(fq, tokens, lens)
        np.testing.assert_array_equal(a, b)


def test_engine_fuse_flag_matches_unfused():
    """SpecEngine(fuse_exec=True) output == fuse_exec=False (default goldens
    all run fused; this pins the flag equivalence end-to-end)."""
    from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
    from tests.test_spec_parity import CFG as PCFG, PARAMS, _prompt

    kw = dict(mode="streamingllm", gamma=3, draft_budget=33, max_seq_len=256,
              chunk_size=16, window_size=8, sink_size=4, max_gen=16,
              eot_ids=(-1,), cache_dtype=jnp.float32)
    prompt = _prompt(4, 48, seed=11)
    outs = []
    for fuse in (True, False):
        eng = SpecEngine(PARAMS, PCFG, EngineConfig(fuse_exec=fuse, **kw))
        assert (eng.params["layers"].get("wqkv") is not None) == fuse
        st = eng.encode(prompt)
        _, stats = eng.generate(st)
        outs.append((np.asarray(stats["output"]),
                     np.asarray(stats["num_committed"])))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
