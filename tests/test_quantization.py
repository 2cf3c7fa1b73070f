"""M5 gates: INT8/INT4 weight-only quantization correctness
(reference Engine/quantize.py behavior + north-star INT4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdec_tpu import quantization as Q
from magicdec_tpu.config import tiny_config
from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
from magicdec_tpu.models import llama as M
from tests.test_spec_parity import _random_params, _prompt, CFG, PARAMS


def test_int8_roundtrip_error_small():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    wq = Q.quantize_weight(w, bits=8)
    deq = Q.dequantize_weight(wq, dtype=jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    scale = np.asarray(wq.scale).max()
    assert err <= scale * 0.5 + 1e-6


def test_int4_pack_unpack_roundtrip():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randint(-8, 8, size=(3, 16, 5)).astype(np.int8))
    packed = Q.pack_int4(q)
    assert packed.shape == (3, 8, 5)
    np.testing.assert_array_equal(np.asarray(Q.unpack_int4(packed)), np.asarray(q))


@pytest.mark.parametrize("bits,group", [(8, None), (4, None), (4, 16), (8, 32)])
def test_quant_matmul_matches_dequant(bits, group):
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(64, 48).astype(np.float32))
    x = jnp.asarray(rng.randn(5, 64).astype(np.float32))
    wq = Q.quantize_weight(w, bits=bits, group_size=group)
    ref = x @ Q.dequantize_weight(wq, dtype=jnp.float32)
    out = Q.quant_matmul(x, wq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_group_scales_reduce_int4_error():
    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.randn(256, 64).astype(np.float32))
    err = {}
    for g in (256, 32):
        deq = Q.dequantize_weight(Q.quantize_weight(w, bits=4, group_size=g),
                                  dtype=jnp.float32)
        err[g] = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
    assert err[32] < err[256] * 0.85, err


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_model_close_to_fp(bits):
    """Quantized forward must stay close to fp32 logits (perplexity-gate proxy,
    SURVEY.md §7 M5)."""
    qparams = Q.quantize_params(PARAMS, bits=bits,
                                group_size=16 if bits == 4 else None)
    assert Q.is_quantized(qparams["layers"]["wq"])
    tokens = _prompt(2, 16, seed=9)
    shape = (CFG.n_layer, 2, 32, CFG.n_kv_head * CFG.head_dim)
    caches = {"k": jnp.zeros(shape), "v": jnp.zeros(shape)}
    ref, _ = M.forward_target(PARAMS, CFG, tokens, jnp.zeros(2, jnp.int32),
                              caches, return_logits=True)
    out, _ = M.forward_target(qparams, CFG, tokens, jnp.zeros(2, jnp.int32),
                              {"k": caches["k"], "v": caches["v"]},
                              return_logits=True)
    ref, out = np.asarray(ref), np.asarray(out)
    # cosine similarity per position
    cos = (ref * out).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                 * np.linalg.norm(out, axis=-1) + 1e-9)
    # int8 is near-lossless; int4 on *gaussian* (structureless) weights with
    # near-zero-norm random logits is the worst case for weight-only quant —
    # the real-model gate is the perplexity check (SURVEY.md §7 M5), this just
    # guards against sign/packing bugs (those drive mean cosine to ~0).
    if bits == 8:
        assert cos.min() > 0.98, cos.min()
    else:
        assert cos.mean() > 0.6, cos.mean()


def test_quantized_spec_generation_runs_and_is_self_consistent():
    """Greedy spec == greedy AR must hold under quantization too (the engine's
    lossless-verification contract is bit-width independent)."""
    qparams = Q.quantize_params(PARAMS, bits=8)
    ecfg = EngineConfig(mode="streamingllm", gamma=2, draft_budget=33,
                        max_seq_len=256, chunk_size=16, window_size=8,
                        sink_size=4, max_gen=12, eot_ids=(-1,),
                        cache_dtype=jnp.float32)
    engine = SpecEngine(qparams, CFG, ecfg)
    prompt = _prompt(2, 48, seed=4)
    bst = engine.encode_baseline(prompt)
    _, bstats = engine.generate_baseline(bst, max_new=12)
    st = engine.encode(prompt)
    _, stats = engine.generate(st)
    out, ref = np.asarray(stats["output"]), np.asarray(bstats["output"])
    n = np.asarray(stats["num_committed"])
    for b in range(2):
        m = min(int(n[b]), 12)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])


def test_bits_from_path():
    assert Q.bits_from_path("/ckpt/llama-int8/model.npz") == 8
    assert Q.bits_from_path("llama-3.1-8b-int4.npz") == 4
    assert Q.bits_from_path("llama-3.1-8b.npz") is None


def test_quantized_checkpoint_roundtrip(tmp_path):
    """convert --quantize writes a flat npz; load_converted must rebuild
    QuantizedWeight leaves that produce identical logits."""
    import numpy as np
    from magicdec_tpu.utils.checkpoint import load_converted

    qparams = Q.quantize_params(PARAMS, bits=4, group_size=16)
    flat = {}

    def flatten(prefix, tree):
        if tree is None:
            return
        if Q.is_quantized(tree):
            flat[prefix + "q"] = np.asarray(tree.q)
            flat[prefix + "scale"] = np.asarray(tree.scale)
            flat[prefix + "bits"] = np.asarray(tree.bits)
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                flatten(f"{prefix}{k}.", v)
            return
        flat[prefix[:-1]] = np.asarray(tree)

    flatten("", qparams)
    path = tmp_path / "model-int4.npz"
    np.savez(path, **flat)
    loaded = load_converted(str(path), dtype=jnp.float32)
    assert Q.is_quantized(loaded["layers"]["wq"])
    assert loaded["layers"]["wq"].bits == 4
    assert loaded["layers"]["wq"].group_size == 16

    tokens = _prompt(2, 8, seed=1)
    shape = (CFG.n_layer, 2, 16, CFG.n_kv_head * CFG.head_dim)
    caches = {"k": jnp.zeros(shape), "v": jnp.zeros(shape)}
    ref, _ = M.forward_target(qparams, CFG, tokens, jnp.zeros(2, jnp.int32),
                              caches, return_logits=True)
    out, _ = M.forward_target(loaded, CFG, tokens, jnp.zeros(2, jnp.int32),
                              {"k": caches["k"], "v": caches["v"]},
                              return_logits=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode,prefix", [("streamingllm", 48), ("snapkv", 40)])
def test_draft_quant_selfspec_matches_full_precision_greedy(mode, prefix):
    """EngineConfig.draft_quant quantizes only the DRAFT pass's weight copy;
    the committed output must still equal the full-precision target's greedy
    output (verification is lossless regardless of draft quality)."""
    base = dict(gamma=2, draft_budget=33, max_seq_len=256, chunk_size=16,
                window_size=8, sink_size=4, max_gen=14, eot_ids=(-1,),
                cache_dtype=jnp.float32)
    fp = SpecEngine(PARAMS, CFG, EngineConfig(mode=mode, **base))
    prompt = _prompt(2, prefix, seed=11)
    bst = fp.encode_baseline(prompt)
    _, bstats = fp.generate_baseline(bst, max_new=14)
    ref = np.asarray(bstats["output"])

    dq = SpecEngine(PARAMS, CFG,
                    EngineConfig(mode=mode, draft_quant="int8", **base))
    assert Q.is_quantized(dq._dq_params["layers"]["wqkv"])
    assert not Q.is_quantized(dq.params["layers"]["wqkv"])  # verify stays dense
    st = dq.encode(prompt)
    _, stats = dq.generate(st)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= 14
    for b in range(2):
        m = min(int(n[b]), 14)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])


def test_draft_quant_pallas_backend_selfspec_greedy_parity():
    """The PALLAS quant backend (interpret on CPU) through the whole engine:
    spec output with an int8 draft running the fused quant_mlp / residual-
    epilogue kernels == full-precision greedy AR.  Shapes are chosen so the
    one-call MLP kernel actually engages (D % 128 == 0, F % 128 == 0 — the
    production llama shapes route here; tiny_config's dim=64 bails to the
    two-call path)."""
    from tests.test_spec_parity import _random_params

    cfg = tiny_config(vocab_size=128, n_layer=2, n_head=2, n_kv_head=2,
                      dim=128, intermediate_size=128, block_size=512)
    params = _random_params(cfg, seed=3)
    base = dict(mode="streamingllm", gamma=2, draft_budget=33, max_seq_len=256,
                chunk_size=16, window_size=8, sink_size=4, max_gen=14,
                eot_ids=(-1,), cache_dtype=jnp.float32)
    fp = SpecEngine(params, cfg, EngineConfig(**base))
    prompt = _prompt(2, 48, seed=17)  # CFG.vocab==128 == cfg.vocab here
    bst = fp.encode_baseline(prompt)
    _, bstats = fp.generate_baseline(bst, max_new=14)
    ref = np.asarray(bstats["output"])

    old = Q._MATMUL_BACKEND
    Q.set_matmul_backend("pallas")
    try:
        # the fused-exec draft weights must take the quant_mlp fast path
        dq = SpecEngine(params, cfg,
                        EngineConfig(draft_quant="int8", **base))
        w13 = jax.tree_util.tree_map(  # layer 0 slice, as the scan sees it
            lambda a: a[0], dq._dq_params["layers"]["w13"],
            is_leaf=lambda a: hasattr(a, "shape"))
        probe = Q.quant_mlp(jnp.zeros((2, cfg.dim), jnp.float32), w13,
                            jax.tree_util.tree_map(
                                lambda a: a[0], dq._dq_params["layers"]["w2"],
                                is_leaf=lambda a: hasattr(a, "shape")),
                            (jnp.ones((cfg.dim,), jnp.float32), 1e-5))
        assert probe is not None, "quant_mlp should engage at these shapes"
        st = dq.encode(prompt)
        _, stats = dq.generate(st)
    finally:
        Q.set_matmul_backend(old)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= 14
    for b in range(2):
        m = min(int(n[b]), 14)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])


@pytest.mark.parametrize("quantize", [False, True])
def test_target_pallas_backend_spec_equals_ar(quantize):
    """Golden spec == AR with the pallas backend on the TARGET path (ADVICE
    r4: the int8-target / dense-target kernels had no engine-level golden
    coverage).  ``quantize=True`` runs int8 TARGET weights through the fused
    quant kernels on verify AND baseline; ``quantize=False`` runs bf16 target
    weights through the round-5 dense fused kernels (dense_matmul /
    dense_mlp).  Shapes engage the kernels (D=512 so In % 512 == 0); spec
    and AR run the SAME engine, so the contract is the M-invariant routing:
    verify rows (M = B*(gamma+1)) must be bit-identical to baseline rows
    (M = B)."""
    from bench import make_params
    from magicdec_tpu.config import ModelConfig

    cfg = ModelConfig(name="t512", block_size=512, vocab_size=256, n_layer=2,
                      n_head=8, n_kv_head=4, dim=512, intermediate_size=1024)
    params = make_params(cfg, dtype=jnp.float32)
    old = Q._MATMUL_BACKEND
    Q.set_matmul_backend("pallas")
    Q.set_dense_kernels(True)  # off by default (slower than XLA on-chip);
                               # the M-invariant routing contract still gates
    try:
        if quantize:
            params = Q.quantize_params(params, bits=8)
        ecfg = EngineConfig(mode="streamingllm", gamma=3, draft_budget=65,
                            max_seq_len=256, chunk_size=32, sink_size=8,
                            max_gen=14, eot_ids=(-1,),
                            cache_dtype=jnp.float32)
        eng = SpecEngine(params, cfg, ecfg)
        # the hint must engage the kernels at these shapes on both passes
        assert eng._hinted(2).decode_rows == 8
        if not quantize:
            w13 = eng.params["layers"]["w13"][0]
            probe = Q.dense_mlp(jnp.zeros((2, cfg.dim), jnp.float32), w13,
                                eng.params["layers"]["w2"][0],
                                (jnp.ones((cfg.dim,), jnp.float32), 1e-5),
                                rows_hint=8)
            assert probe is not None, "dense_mlp should engage at these shapes"
        rng = np.random.RandomState(23)
        prompt = jnp.asarray(rng.randint(0, 256, size=(2, 64)), jnp.int32)
        st = eng.encode(prompt)
        _, stats = eng.generate(st)
        bst = eng.encode_baseline(prompt)
        _, bstats = eng.generate_baseline(bst, max_new=14)
    finally:
        Q.set_matmul_backend(old)
        Q.set_dense_kernels(False)
    out = np.asarray(stats["output"])
    ref = np.asarray(bstats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= 14
    for b in range(2):
        m = min(int(n[b]), 14)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])


def test_draft_quant_longspec_matches_full_precision_greedy():
    from magicdec_tpu.engine.engine import LongSpecEngine
    from tests.test_longspec import DRAFT_CFG, DRAFT_PARAMS

    base = dict(mode="streamingllm", gamma=2, draft_budget=33, max_seq_len=256,
                chunk_size=16, window_size=8, sink_size=4, max_gen=14,
                eot_ids=(-1,), cache_dtype=jnp.float32)
    fp = SpecEngine(PARAMS, CFG, EngineConfig(**base))
    prompt = _prompt(2, 48, seed=12)
    bst = fp.encode_baseline(prompt)
    _, bstats = fp.generate_baseline(bst, max_new=14)
    ref = np.asarray(bstats["output"])

    eng = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG,
                         EngineConfig(draft_quant="int4", **base))
    assert Q.is_quantized(eng.draft_params["layers"]["wqkv"])
    assert not Q.is_quantized(eng.params["layers"]["wqkv"])
    st = eng.encode(prompt)
    _, stats = eng.generate(st)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= 14
    for b in range(2):
        m = min(int(n[b]), 14)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])


def test_draft_quant_shared_head_matches_full_precision_greedy():
    """draft_quant_head=False: the draft copy shares the target's lm_head
    BUFFER (no extra memory) and the greedy contract still holds."""
    base = dict(mode="streamingllm", gamma=2, draft_budget=33, max_seq_len=256,
                chunk_size=16, window_size=8, sink_size=4, max_gen=14,
                eot_ids=(-1,), cache_dtype=jnp.float32)
    fp = SpecEngine(PARAMS, CFG, EngineConfig(**base))
    prompt = _prompt(2, 48, seed=21)
    bst = fp.encode_baseline(prompt)
    _, bstats = fp.generate_baseline(bst, max_new=14)
    ref = np.asarray(bstats["output"])

    dq = SpecEngine(PARAMS, CFG,
                    EngineConfig(draft_quant="int8", draft_quant_head=False,
                                 **base))
    assert not Q.is_quantized(dq._dq_params["lm_head"])
    assert dq._dq_params["lm_head"] is dq.params["lm_head"]  # shared buffer
    assert Q.is_quantized(dq._dq_params["layers"]["wqkv"])
    st = dq.encode(prompt)
    _, stats = dq.generate(st)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= 14
    for b in range(2):
        m = min(int(n[b]), 14)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])


def test_quantized_embed_lookup_and_tied_head():
    """quantize_embed stores [D, V] with per-vocab scales: lookup must equal
    dequantized rows exactly, and the tied head must equal the dequantized
    table's logits."""
    rng = np.random.RandomState(0)
    V, D = 96, 32
    embed = jnp.asarray(rng.randn(V, D).astype(np.float32))
    eq = Q.quantize_embed(embed)
    assert eq.q.shape == (D, V)
    deq = Q.dequantize_weight(eq, jnp.float32).T          # [V, D]

    params = {"embed": eq, "final_norm": jnp.ones((D,), jnp.float32),
              "lm_head": None}
    toks = jnp.asarray(rng.randint(0, V, (2, 5)), jnp.int32)
    got = M.embed_lookup(params, toks, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(deq[toks]),
                               rtol=1e-6, atol=1e-6)
    # embeddings survive int8 to ~1% relative error
    rel = np.abs(np.asarray(deq) - np.asarray(embed)).max() / np.abs(embed).max()
    assert rel < 0.02, rel

    x = jnp.asarray(rng.randn(2, 3, D).astype(np.float32))
    logits = M.head_logits(params, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(x @ deq.T),
                               rtol=1e-5, atol=1e-5)


def test_quantized_embed_spec_matches_ar():
    """Greedy spec == greedy AR on a model with a quantized embedding table
    (target and draft share the table, so acceptance semantics are intact)."""
    params = dict(PARAMS, embed=Q.quantize_embed(PARAMS["embed"]))
    ecfg = EngineConfig(mode="streamingllm", gamma=3, draft_budget=33,
                        max_seq_len=256, chunk_size=16, window_size=8,
                        sink_size=4, max_gen=16, eot_ids=(-1,),
                        cache_dtype=jnp.float32)
    eng = SpecEngine(params, CFG, ecfg)
    prompt = _prompt(2, 64)
    st = eng.encode(prompt)
    st, stats = eng.generate(st)
    bst = eng.encode_baseline(prompt)
    bst, bstats = eng.generate_baseline(bst, max_new=16)
    n = np.asarray(stats["num_committed"])
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(stats["output"])[b, : min(int(n[b]), 16)],
            np.asarray(bstats["output"])[b, : min(int(n[b]), 16)])


def test_quantize_params_include_embed():
    p = Q.quantize_params(PARAMS, bits=8, include_embed=True)
    assert Q.is_quantized(p["embed"])
    # a tied model whose embed is already quantized needs no materialized
    # head: head_logits dispatches on the quantized table directly
    tied = dict(PARAMS, embed=p["embed"], lm_head=None)
    p2 = Q.quantize_params(tied, bits=8, include_embed=True,
                           materialize_tied_head=True)
    assert p2["embed"] is p["embed"]
    assert p2.get("lm_head") is None
