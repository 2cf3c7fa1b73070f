"""Gumbel-coupled speculative SAMPLING golden gates.

The reference never samples during speculation (its samplers,
Engine/utils.py:88-149, are unused by every benchmark; all drivers decode
greedily, SURVEY.md §2.2).  This framework extends exactness to temperature /
top-p sampling via coupled Gumbel noise (ops/sampling.py coupled_gumbel):
draft and target perturb their logits with the same per-(request, stream
position) noise row, so the greedy-match acceptance rule commits exact
ancestral samples from the target distribution.

Contract proven here: speculative sampling output == baseline sampling output
token-for-token (same rng key), for every engine mode.  Since the baseline is
a plain per-step Gumbel-max categorical sample, equality IS the exactness
proof.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdec_tpu.config import tiny_config
from magicdec_tpu.engine.engine import EngineConfig, LongSpecEngine, SpecEngine
from magicdec_tpu.ops import sampling as S
from tests.test_longspec import DRAFT_CFG, DRAFT_PARAMS
from tests.test_spec_parity import CFG, PARAMS, _prompt

KEY = jax.random.PRNGKey(1234)


def _ecfg(mode, *, temperature, top_p=1.0, max_gen=24):
    return EngineConfig(mode=mode, gamma=3, draft_budget=33, max_seq_len=256,
                        chunk_size=16, window_size=8, sink_size=4,
                        max_gen=max_gen, eot_ids=(-1,),
                        cache_dtype=jnp.float32,
                        temperature=temperature, top_p=top_p)


def _baseline_sampled(ecfg, prompt, n):
    # mode only selects the (unused) draft cache; SpecEngine rejects "full"
    if ecfg.mode not in SpecEngine.ALLOWED_MODES:
        ecfg = _ecfg("streamingllm", temperature=ecfg.temperature,
                     top_p=ecfg.top_p, max_gen=ecfg.max_gen)
    engine = SpecEngine(PARAMS, CFG, ecfg)
    st = engine.encode_baseline(prompt, rng=KEY)
    st, stats = engine.generate_baseline(st, max_new=n)
    return np.asarray(stats["output"][:, :n])


# ---------------------------------------------------------------------------
# sampler-op unit gates
# ---------------------------------------------------------------------------

def test_coupled_gumbel_deterministic_and_stream_distinct():
    salt = jnp.asarray([0, 1], jnp.int32)
    idx = jnp.asarray([[0, 1], [0, 1]], jnp.int32)
    g1 = S.coupled_gumbel(KEY, salt, idx, 16)
    g2 = S.coupled_gumbel(KEY, salt, idx, 16)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # distinct (salt, idx) pairs give distinct rows; same pair gives the same
    # row regardless of where it appears in the batch/window
    assert not np.allclose(g1[0, 0], g1[0, 1])
    assert not np.allclose(g1[0, 0], g1[1, 0])
    g3 = S.coupled_gumbel(KEY, salt, jnp.asarray([[1, 0], [1, 1]], jnp.int32), 16)
    np.testing.assert_array_equal(np.asarray(g3[0, 1]), np.asarray(g1[0, 0]))
    np.testing.assert_array_equal(np.asarray(g3[1, 0]), np.asarray(g1[1, 1]))


def test_gumbel_sample_matches_categorical_distribution():
    """Gumbel-max over many stream positions reproduces softmax frequencies."""
    logits = jnp.asarray([[0.0, 1.0, 2.0, -1.0]], jnp.float32)
    n = 4000
    idx = jnp.arange(n, dtype=jnp.int32)[None]
    toks = S.gumbel_sample_tokens(
        jnp.broadcast_to(logits[:, None], (1, n, 4)), KEY,
        jnp.zeros((1,), jnp.int32), idx, temperature=1.0)
    freq = np.bincount(np.asarray(toks)[0], minlength=4) / n
    expect = np.asarray(jax.nn.softmax(logits[0]))
    np.testing.assert_allclose(freq, expect, atol=0.03)


def test_gumbel_sample_respects_top_p():
    """Tokens outside the nucleus are never sampled."""
    logits = jnp.asarray([[4.0, 3.5, -2.0, -3.0]], jnp.float32)
    n = 500
    idx = jnp.arange(n, dtype=jnp.int32)[None]
    toks = np.asarray(S.gumbel_sample_tokens(
        jnp.broadcast_to(logits[:, None], (1, n, 4)), KEY,
        jnp.zeros((1,), jnp.int32), idx, temperature=1.0, top_p=0.9))
    assert set(np.unique(toks)) <= {0, 1}


# ---------------------------------------------------------------------------
# engine golden gates: spec sampling == baseline sampling, token-identical
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode,prefix,top_p", [
    ("streamingllm", 96, 1.0),
    ("streamingllm", 32, 0.9),
    ("snapkv", 104, 1.0),
])
def test_selfspec_sampling_matches_baseline_sampling(mode, prefix, top_p):
    B, max_gen = 2, 24
    ecfg = _ecfg(mode, temperature=0.8, top_p=top_p, max_gen=max_gen)
    prompt = _prompt(B, prefix, seed=5)
    ref = _baseline_sampled(ecfg, prompt, max_gen)

    engine = SpecEngine(PARAMS, CFG, ecfg)
    st = engine.encode(prompt, rng=KEY)
    st, stats = engine.generate(st)
    out = np.asarray(stats["output"])
    n_committed = np.asarray(stats["num_committed"])
    assert n_committed.max() >= max_gen, n_committed
    for b in range(B):
        n = min(int(n_committed[b]), max_gen)
        np.testing.assert_array_equal(
            out[b, :n], ref[b, :n],
            err_msg=f"sampling exactness broken for {mode} top_p={top_p}")


@pytest.mark.parametrize("mode,prefix", [("full", 48), ("streamingllm", 96)])
def test_longspec_sampling_matches_baseline_sampling(mode, prefix):
    B, max_gen = 2, 20
    ecfg = _ecfg(mode, temperature=0.7, max_gen=max_gen)
    prompt = _prompt(B, prefix, seed=9)
    ref = _baseline_sampled(ecfg, prompt, max_gen)

    engine = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg)
    st = engine.encode(prompt, rng=KEY)
    st, stats = engine.generate(st)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= max_gen, n
    for b in range(B):
        m = min(int(n[b]), max_gen)
        np.testing.assert_array_equal(
            out[b, :m], ref[b, :m],
            err_msg=f"longspec sampling exactness broken ({mode})")


def test_sampling_requires_rng():
    engine = SpecEngine(PARAMS, CFG, _ecfg("streamingllm", temperature=0.8))
    with pytest.raises(ValueError, match="rng"):
        engine.encode(_prompt(2, 32))


def test_greedy_unaffected_by_sampling_fields():
    """temperature=0 keeps the original argmax path and state pytree."""
    engine = SpecEngine(PARAMS, CFG, _ecfg("streamingllm", temperature=0.0))
    st = engine.encode(_prompt(2, 32))
    assert st.rng is None and st.salt is None
