"""Perplexity evaluator: chunked-scan NLL must equal a one-shot full-context
oracle, and quantization must cost only a bounded perplexity increase (the
M5 gate, SURVEY.md §7 — the reference ships int8 with no quality check)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdec_tpu import quality
from magicdec_tpu import quantization as Q
from magicdec_tpu.models import llama as M
from tests.test_spec_parity import CFG, PARAMS


def _windows(n, S, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, CFG.vocab_size, size=(n, S)).astype(np.int32)


def _oracle_nll(params, tokens):
    """One-shot full-context teacher-forced NLL (no chunking, no cache)."""
    B, S = tokens.shape
    caches = {"k": jnp.zeros((CFG.n_layer, B, S, CFG.n_kv_head * CFG.head_dim),
                             jnp.float32)}
    caches["v"] = jnp.zeros_like(caches["k"])
    logits, _ = M.forward_target(params, CFG, jnp.asarray(tokens),
                                 jnp.zeros((B,), jnp.int32), caches,
                                 head="logits")
    lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    tot = 0.0
    for b in range(B):
        for t in range(S - 1):
            tot -= lp[b, t, tokens[b, t + 1]]
    return tot / (B * (S - 1))


def test_chunked_nll_matches_oracle():
    data = _windows(2, 64, seed=3)
    ppl, nll = quality.perplexity(PARAMS, CFG, data, batch_size=2,
                                  chunk_size=16, cache_dtype=jnp.float32)
    ref = _oracle_nll(PARAMS, data)
    assert abs(nll - ref) < 1e-4, (nll, ref)
    assert abs(ppl - np.exp(ref)) < 1e-2


def test_partial_batches_dropped():
    data = _windows(5, 32, seed=4)
    ppl2, _ = quality.perplexity(PARAMS, CFG, data, batch_size=2,
                                 chunk_size=16, cache_dtype=jnp.float32)
    ppl2_full, _ = quality.perplexity(PARAMS, CFG, data[:4], batch_size=2,
                                      chunk_size=16, cache_dtype=jnp.float32)
    assert ppl2 == ppl2_full  # row 5 dropped like the reference's drop_last


def test_kv_quant_perplexity_gate():
    """int8 KV cache (EngineConfig.kv_quant) must be nearly free in NLL."""
    data = _windows(2, 64, seed=6)
    _, nll_full = quality.perplexity(PARAMS, CFG, data, batch_size=2,
                                     chunk_size=16, cache_dtype=jnp.float32)
    _, nll_q = quality.perplexity(PARAMS, CFG, data, batch_size=2,
                                  chunk_size=16, cache_dtype=jnp.float32,
                                  kv_quant=True)
    rel = abs(nll_q - nll_full) / nll_full
    assert rel < 0.01, f"kv int8: nll {nll_full:.4f} -> {nll_q:.4f} ({rel:.3%})"


@pytest.mark.parametrize("bits,tol", [(8, 0.02), (4, 0.25)])
def test_quantization_perplexity_gate(bits, tol):
    """int8 per-channel must be nearly free; int4 group-wise bounded."""
    data = _windows(2, 64, seed=5)
    ppl_full, nll_full = quality.perplexity(PARAMS, CFG, data, batch_size=2,
                                            chunk_size=16,
                                            cache_dtype=jnp.float32)
    qparams = Q.quantize_params(PARAMS, bits=bits)
    ppl_q, nll_q = quality.perplexity(qparams, CFG, data, batch_size=2,
                                      chunk_size=16, cache_dtype=jnp.float32)
    rel = abs(nll_q - nll_full) / nll_full
    assert rel < tol, f"int{bits}: nll {nll_full:.4f} -> {nll_q:.4f} ({rel:.3%})"


def test_kv_int4_perplexity_gate():
    """int4 KV cache: bounded NLL drift (coarser than int8 — 15 levels per
    (token, head) group — but must stay within a few percent)."""
    data = _windows(2, 64, seed=7)
    _, nll_full = quality.perplexity(PARAMS, CFG, data, batch_size=2,
                                     chunk_size=16, cache_dtype=jnp.float32)
    _, nll_q = quality.perplexity(PARAMS, CFG, data, batch_size=2,
                                  chunk_size=16, cache_dtype=jnp.float32,
                                  kv_quant="int4")
    rel = abs(nll_q - nll_full) / nll_full
    assert rel < 0.05, f"kv int4: nll {nll_full:.4f} -> {nll_q:.4f} ({rel:.3%})"
