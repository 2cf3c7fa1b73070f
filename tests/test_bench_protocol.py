"""Gate on the headline bench's synthetic-weight acceptance protocol.

Round 2 shipped a driver-captured collapse (BENCH_r02.json: 1.00 tokens/step,
spec 0.496x SLOWER than AR) caused by a silent protocol change in
``bench.make_params`` (embed scale 0.02 + tied head made the continuation
input-independent block noise — commit e7abb04).  Nothing downstream of
bench.py itself exercised the protocol, so the collapse only surfaced on the
real-TPU run at the end of the round.

This suite runs the bench's own weight constructor through the bench's engine
configuration at a CPU-sized shape and asserts the acceptance the whole
benchmark rests on: a compressed-cache draft built from ``make_params``
weights must agree with the target at >= 2.5 tokens per gamma=3 window
(the published real-checkpoint rate is 0.79-0.84/token => ~3.1/4 tokens,
BASELINE.md; reference protocol tests/SnapKV/selfspec_benchmark.py:221-223).
If a future edit to make_params reintroduces the r02 failure mode, these
tests fail on CPU before any TPU time is spent.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bench import make_params
from magicdec_tpu.config import tiny_config
from magicdec_tpu.engine.engine import EngineConfig, SpecEngine

# Small but not degenerate: enough depth/width that the damped-residual
# construction behaves like the bench's 1B shape (4 layers, GQA 2:1).
CFG = tiny_config(vocab_size=1024, n_layer=4, n_head=8, n_kv_head=4,
                  dim=256, intermediate_size=512)
GAMMA = 3
MIN_TOKENS_PER_STEP = 2.5


def _accept_rate(mode, **ecfg_kw):
    params = make_params(CFG)
    ecfg = EngineConfig(mode=mode, gamma=GAMMA, draft_budget=257,
                        max_seq_len=1024, chunk_size=128, max_gen=64,
                        eot_ids=(-1,), cache_dtype=jnp.bfloat16, **ecfg_kw)
    eng = SpecEngine(params, CFG, ecfg)
    B = 4
    # snapkv shape contract: (prefix - window) % chunk == 0 (bench.py rounds
    # the prefix the same way)
    prefix = 672 if mode == "snapkv" else 768
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, CFG.vocab_size, (B, prefix)),
        jnp.int32)
    st = eng.encode(prompt)
    st, stats = eng.generate(st)
    gen = int(np.asarray(stats["gen_tokens"]).sum())
    steps = int(stats["target_steps"])
    assert steps > 0
    return gen / steps / B


def test_bench_protocol_acceptance_streamingllm():
    rate = _accept_rate("streamingllm")
    assert rate >= MIN_TOKENS_PER_STEP, (
        f"bench synthetic-weight protocol collapsed: {rate:.2f} tokens/step "
        f"(r02 regression was 1.00; expected ~3.1 at gamma={GAMMA})")


def test_bench_protocol_acceptance_quantized_path():
    """The bench's actual default path: int8 KV cache + int8 draft weights."""
    rate = _accept_rate("streamingllm", kv_quant="int8", draft_quant="int8")
    assert rate >= MIN_TOKENS_PER_STEP, rate


def test_bench_protocol_acceptance_snapkv():
    rate = _accept_rate("snapkv")
    assert rate >= MIN_TOKENS_PER_STEP, rate


def test_longspec_coupled_protocol_acceptance():
    """Standalone-draft synthetic protocol (bench.make_longspec_params):
    target and draft share a low-rank bigram backbone through a
    semi-orthogonal projection, so greedy acceptance lands in a realistic
    band instead of the ~0 of two independent random models.  Gate >= 2.2
    tokens/step at gamma=3 (published real-checkpoint longspec rates are
    higher, 0.79-0.84/token ~= 3.1 — the protocol is deliberately
    conservative)."""
    from bench import make_longspec_params
    from magicdec_tpu.engine.engine import LongSpecEngine

    dcfg = tiny_config(vocab_size=1024, n_layer=2, n_head=4, n_kv_head=2,
                       dim=128, intermediate_size=256)
    tp, dp = make_longspec_params(CFG, dcfg)
    ecfg = EngineConfig(mode="streamingllm", gamma=GAMMA, draft_budget=257,
                        max_seq_len=1024, chunk_size=128, max_gen=64,
                        eot_ids=(-1,), cache_dtype=jnp.bfloat16,
                        draft_quant="int8")
    eng = LongSpecEngine(tp, CFG, dp, dcfg, ecfg)
    B = 4
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, CFG.vocab_size, (B, 768)),
        jnp.int32)
    st = eng.encode(prompt)
    st, stats = eng.generate(st)
    gen = int(np.asarray(stats["gen_tokens"]).sum())
    steps = int(stats["target_steps"])
    rate = gen / steps / B
    assert rate >= 2.2, (
        f"coupled longspec protocol degraded: {rate:.2f} tokens/step "
        "(independent random models give ~1.0)")


def test_longspec_coupled_protocol_depth_invariant():
    """Residual noise accumulates with depth; the 1/sqrt(L) default scaling
    must keep acceptance in band at deeper stacks (the un-scaled protocol
    measured 2.9 -> 1.41 tokens/step going from L=4/2 to the real 32/16
    pairing on the TPU)."""
    from bench import make_longspec_params
    from magicdec_tpu.engine.engine import LongSpecEngine

    tcfg = tiny_config(vocab_size=1024, n_layer=8, n_head=8, n_kv_head=4,
                       dim=256, intermediate_size=512)
    dcfg = tiny_config(vocab_size=1024, n_layer=4, n_head=4, n_kv_head=2,
                       dim=128, intermediate_size=256)
    tp, dp = make_longspec_params(tcfg, dcfg)
    ecfg = EngineConfig(mode="streamingllm", gamma=GAMMA, draft_budget=257,
                        max_seq_len=1024, chunk_size=128, max_gen=48,
                        eot_ids=(-1,), cache_dtype=jnp.bfloat16)
    eng = LongSpecEngine(tp, tcfg, dp, dcfg, ecfg)
    B = 4
    prompt = jnp.asarray(
        np.random.RandomState(1).randint(0, 1024, (B, 768)), jnp.int32)
    st = eng.encode(prompt)
    st, stats = eng.generate(st)
    rate = (int(np.asarray(stats["gen_tokens"]).sum())
            / int(stats["target_steps"]) / B)
    assert rate >= 2.2, f"depth scaling broken: {rate:.2f} tokens/step"


def test_make_params_head_is_independent_by_default():
    """make_params(cfg) must produce an UNTIED head even when the config ties
    embeddings: a tied head on random weights degenerates acceptance to
    always-gamma+1 (overstating speedup) at embed scale >= 0.1 and collapses
    it entirely at small scales (the r02 bug paired tied=True with scale
    0.02).  tied=None explicitly opts into following the config."""
    cfg = tiny_config(vocab_size=256, n_layer=2, n_head=4, n_kv_head=2,
                      dim=64, intermediate_size=128, tie_word_embeddings=True)
    assert make_params(cfg)["lm_head"] is not None
    assert make_params(cfg, tied=None)["lm_head"] is None


def test_make_params_embed_dominates_residual():
    """Embed scale ~1.0 is load-bearing (bench.py comment): the token
    embedding must dominate the damped residual stream, or greedy
    continuations stop depending on the input and acceptance collapses."""
    params = make_params(CFG)
    embed_rms = float(jnp.sqrt(jnp.mean(
        jnp.asarray(params["embed"], jnp.float32) ** 2)))
    assert embed_rms > 0.5, embed_rms
