"""M2 golden gate (SURVEY.md §7): greedy speculative decoding must reproduce
greedy autoregressive decoding token-for-token, for both draft-cache variants.

This is the correctness contract the reference only checks by eyeballing
--printoutput (SURVEY.md §4); here it is an exact test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.config import tiny_config
from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
from magicdec_tpu.models import llama as M


def _random_params(cfg, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)

    def w(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0] if len(shape) > 1 else 1))
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale, dtype)

    L, D, F = cfg.n_layer, cfg.dim, cfg.intermediate_size
    layers = {
        "wq": w(L, D, cfg.n_head * cfg.head_dim),
        "wk": w(L, D, cfg.n_kv_head * cfg.head_dim),
        "wv": w(L, D, cfg.n_kv_head * cfg.head_dim),
        "bq": None, "bk": None, "bv": None,
        "wo": w(L, cfg.n_head * cfg.head_dim, D),
        "w1": w(L, D, F), "w3": w(L, D, F), "w2": w(L, F, D),
        "attn_norm": jnp.ones((L, D), dtype), "ffn_norm": jnp.ones((L, D), dtype),
    }
    return {"embed": w(cfg.vocab_size, D, scale=0.05), "layers": layers,
            "final_norm": jnp.ones((D,), dtype),
            "lm_head": w(D, cfg.vocab_size, scale=0.2)}


CFG = tiny_config(vocab_size=128, n_layer=2, n_head=4, n_kv_head=2, dim=64,
                  intermediate_size=128)
PARAMS = _random_params(CFG)


def _engine(mode, prefix, *, budget=33, gamma=3, max_gen=24, window=8):
    ecfg = EngineConfig(
        mode=mode, gamma=gamma, draft_budget=budget, max_seq_len=256,
        chunk_size=16, window_size=window, sink_size=4, max_gen=max_gen,
        eot_ids=(-1,), cache_dtype=jnp.float32)
    return SpecEngine(PARAMS, CFG, ecfg)


def _prompt(B, prefix, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, CFG.vocab_size, size=(B, prefix)), jnp.int32)


def _baseline_tokens(engine, prompt, n):
    st = engine.encode_baseline(prompt)
    st, stats = engine.generate_baseline(st, max_new=n)
    return np.asarray(stats["output"][:, :n])


@pytest.mark.parametrize("mode,prefix", [
    ("streamingllm", 32),   # prefix < budget: draft cache == full cache
    ("streamingllm", 96),   # prefix > budget: sink+window eviction active
    ("snapkv", 40),         # 40 = 2*16 + window(8)
    ("snapkv", 104),
])
def test_spec_matches_autoregressive(mode, prefix):
    B, max_gen = 2, 24
    engine = _engine(mode, prefix)
    prompt = _prompt(B, prefix)

    ref = _baseline_tokens(engine, prompt, max_gen)

    st = engine.encode(prompt)
    st, stats = engine.generate(st)
    out = np.asarray(stats["output"])
    n_committed = np.asarray(stats["num_committed"])
    # termination is batch-global (reference selfspec:211): only the max is
    # guaranteed to reach max_gen; every committed token must match greedy AR.
    assert n_committed.max() >= max_gen, n_committed
    for b in range(B):
        n = min(int(n_committed[b]), max_gen)
        np.testing.assert_array_equal(out[b, :n], ref[b, :n],
                                      err_msg=f"greedy parity broken for {mode}")


def test_streaming_full_acceptance_when_cache_uncompressed():
    """prefix < budget ⇒ draft attends the identical cache ⇒ accepts all."""
    B, max_gen, gamma = 2, 24, 3
    engine = _engine("streamingllm", 32, max_gen=max_gen, gamma=gamma)
    st = engine.encode(_prompt(B, 32))
    st, stats = engine.generate(st)
    # all-accept ⇒ each verify commits gamma+1 tokens
    assert int(stats["target_steps"]) <= -(-max_gen // (gamma + 1)) + 1


def test_acceptance_rate_reasonable_snapkv():
    B, prefix = 2, 104
    engine = _engine("snapkv", prefix)
    st = engine.encode(_prompt(B, prefix))
    st, stats = engine.generate(st)
    steps = int(stats["target_steps"])
    committed = int(np.asarray(stats["num_committed"]).sum())
    # accepted tokens per target step must be >= 1 by construction
    assert committed >= steps


def test_eot_stops_generation():
    B, prefix = 2, 32
    engine = _engine("streamingllm", prefix)
    st = engine.encode(_prompt(B, prefix))
    # make every token an EOT: generation must stop after the first window
    engine_eot = SpecEngine(PARAMS, CFG, engine.ecfg.__class__(
        **{**engine.ecfg.__dict__, "eot_ids": tuple(range(CFG.vocab_size))}))
    st = engine_eot.encode(_prompt(B, prefix))
    st, stats = engine_eot.generate(st)
    assert int(stats["target_steps"]) == 1


def test_prefill_chunk_size_invariance():
    """Generation must not depend on the prefill chunking (fp32, CPU)."""
    import dataclasses
    B, prefix, max_gen = 2, 96, 12
    eng_small = _engine("streamingllm", prefix, max_gen=max_gen)
    eng_big = SpecEngine(PARAMS, CFG, dataclasses.replace(
        eng_small.ecfg, prefill_chunk_size=48))
    prompt = _prompt(B, prefix, seed=6)
    ref = _baseline_tokens(eng_small, prompt, max_gen)
    out = _baseline_tokens(eng_big, prompt, max_gen)
    np.testing.assert_array_equal(ref, out)


@pytest.mark.parametrize("mode,prefix", [
    ("streamingllm", 88),   # 88 % 48 = 40: remainder chunk != full chunks
    ("snapkv", 88),         # snapkv contract: 88 ≡ window(8) mod chunk(16);
                            # target prefill covers 80 tokens, 80 % 48 = 32
])
def test_prefill_chunk_remainder(mode, prefix):
    """prefill_chunk_size != chunk_size AND prefix % prefill_chunk_size != 0:
    the remainder chunk must be sliced at n_full * prefill_chunk_size (VERDICT
    r1 weak-1: it was sliced at n_full * chunk_size, silently re-prefilling
    part of the prefix with wrong length accounting)."""
    import dataclasses
    B, max_gen = 2, 12
    eng_ref = _engine(mode, prefix, max_gen=max_gen)
    eng_cp = SpecEngine(PARAMS, CFG, dataclasses.replace(
        eng_ref.ecfg, prefill_chunk_size=48))
    prompt = _prompt(B, prefix, seed=7)

    def spec_tokens(engine):
        st = engine.encode(prompt)
        st, stats = engine.generate(st)
        out = np.asarray(stats["output"])
        n = np.asarray(stats["num_committed"])
        assert n.max() >= max_gen, n
        return [out[b, :min(int(n[b]), max_gen)] for b in range(B)]

    for ref_b, out_b in zip(spec_tokens(eng_ref), spec_tokens(eng_cp)):
        m = min(len(ref_b), len(out_b))
        np.testing.assert_array_equal(ref_b[:m], out_b[:m])


def test_split_prefill_encode_matches_monolithic():
    """EngineConfig.prefill_max_call_tokens: the multi-call donated prefill
    must reproduce the single-program encode bit-exactly (same chunk
    boundaries, same kernels — only the jit call structure differs), for the
    spec AND baseline paths, dense and quantized caches."""
    import dataclasses

    for kv_quant in (False, "int8"):
        mono = dataclasses.replace(_ecfg_obj(), prefill_max_call_tokens=0,
                                   kv_quant=kv_quant)
        split = dataclasses.replace(mono, prefill_max_call_tokens=48)
        e_mono = SpecEngine(PARAMS, CFG, mono)
        e_split = SpecEngine(PARAMS, CFG, split)
        prompt = _prompt(2, 96)
        assert e_split._split_part_size(96) == 48

        st_m = e_mono.encode(prompt)
        st_s = e_split.encode(prompt)
        np.testing.assert_array_equal(np.asarray(st_m.token0),
                                      np.asarray(st_s.token0))
        for f in ("k", "v", "dk", "dv", "target_lens", "draft_fill"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_m, f), np.float32),
                np.asarray(getattr(st_s, f), np.float32), err_msg=f)

        st_m, stats_m = e_mono.generate(st_m)
        st_s, stats_s = e_split.generate(st_s)
        np.testing.assert_array_equal(np.asarray(stats_m["output"]),
                                      np.asarray(stats_s["output"]))

        bm = e_mono.encode_baseline(prompt)
        bs = e_split.encode_baseline(prompt)
        np.testing.assert_array_equal(np.asarray(bm.token0),
                                      np.asarray(bs.token0))
        np.testing.assert_array_equal(np.asarray(bm.k, np.float32),
                                      np.asarray(bs.k, np.float32))


def _ecfg_obj():
    return EngineConfig(mode="streamingllm", gamma=3, draft_budget=33,
                        max_seq_len=256, chunk_size=16, prefill_chunk_size=48,
                        window_size=8, sink_size=4, max_gen=16, eot_ids=(-1,),
                        cache_dtype=jnp.float32)


def test_split_prefill_snapkv_matches_monolithic():
    """Round-5 mode-agnostic split prefill: snapkv self-spec's pre-window
    prefix as bounded donated calls + window/compress tail must reproduce
    the monolithic encode bit-exactly (state AND generated tokens)."""
    import dataclasses

    for kv_quant in (False, "int8"):
        mono = dataclasses.replace(
            _ecfg_obj(), mode="snapkv", prefill_max_call_tokens=0,
            kv_quant=kv_quant)
        split = dataclasses.replace(mono, prefill_max_call_tokens=48)
        e_mono = SpecEngine(PARAMS, CFG, mono)
        e_split = SpecEngine(PARAMS, CFG, split)
        prefix = 104  # pre-window 96 = 2 x 48-token parts
        prompt = _prompt(2, prefix)
        assert e_split._split_part_size(prefix) == 48

        st_m = e_mono.encode(prompt)
        st_s = e_split.encode(prompt)
        np.testing.assert_array_equal(np.asarray(st_m.token0),
                                      np.asarray(st_s.token0))
        for f in ("k", "v", "dk", "dv", "target_lens", "draft_fill",
                  "draft_pos"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_m, f), np.float32),
                np.asarray(getattr(st_s, f), np.float32), err_msg=f)
        if kv_quant:
            np.testing.assert_array_equal(np.asarray(st_m.ks, np.float32),
                                          np.asarray(st_s.ks, np.float32))

        st_m, stats_m = e_mono.generate(st_m)
        st_s, stats_s = e_split.generate(st_s)
        np.testing.assert_array_equal(np.asarray(stats_m["output"]),
                                      np.asarray(stats_s["output"]))

        # baseline split with a RAGGED prefix (104 = 2*48 + 8: snapkv-style
        # k*chunk + window shapes must split too — the final remainder part
        # absorbs the sub-chunk tail in one bounded call)
        bm = e_mono.encode_baseline(prompt)
        bs = e_split.encode_baseline(prompt)
        np.testing.assert_array_equal(np.asarray(bm.token0),
                                      np.asarray(bs.token0))
        np.testing.assert_array_equal(np.asarray(bm.k, np.float32),
                                      np.asarray(bs.k, np.float32))
