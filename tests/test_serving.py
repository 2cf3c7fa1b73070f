"""Continuous-batching serving engine: per-request lifecycle correctness.

Gold standard: every request served through the shared batch must produce
exactly the tokens the fixed-batch engine produces for it alone (slots are
isolated — attention and caches are per-request)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.engine.engine import EngineConfig, LongSpecEngine, SpecEngine
from magicdec_tpu.engine.serving import ServingEngine, ServingLongSpecEngine
from tests.test_longspec import DRAFT_CFG, DRAFT_PARAMS
from tests.test_spec_parity import CFG, PARAMS


def _ecfg(max_gen=16, eot=(-1,), mode="streamingllm"):
    return EngineConfig(mode=mode, gamma=3, draft_budget=33,
                        max_seq_len=256, chunk_size=16, window_size=8,
                        sink_size=4, max_gen=max_gen, eot_ids=eot,
                        cache_dtype=jnp.float32)


def _prompts(n, prefix, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, CFG.vocab_size, size=prefix).astype(np.int32)
            for _ in range(n)]


def _solo_reference(prompt, ecfg):
    """One request alone through the fixed-batch engine."""
    engine = SpecEngine(PARAMS, CFG, ecfg)
    st = engine.encode(jnp.asarray(prompt)[None])
    st, stats = engine.generate(st)
    n = int(np.asarray(stats["num_committed"])[0])
    return np.asarray(stats["output"])[0, :n]


def test_serving_matches_solo_generation():
    ecfg = _ecfg(max_gen=12)
    prompts = _prompts(5, 48, seed=3)
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)
    assert len(outs) == 5
    for prompt, out in zip(prompts, outs):
        ref = _solo_reference(prompt, ecfg)
        np.testing.assert_array_equal(out, ref)


def test_serving_with_eot_variable_lengths():
    """Pick a busy token as EOT so requests terminate at different lengths;
    slot recycling must still match solo runs exactly."""
    base = _ecfg(max_gen=20)
    solo = SpecEngine(PARAMS, CFG, base)
    prompts = _prompts(4, 48, seed=11)
    # find a token that actually occurs early in some solo generation
    st = solo.encode(jnp.asarray(prompts[0])[None])
    _, stats = solo.generate(st)
    eot_tok = int(np.asarray(stats["output"])[0, 5])

    ecfg = _ecfg(max_gen=20, eot=(eot_tok,))
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=1)
    lens = {len(o) for o in outs}
    for prompt, out in zip(prompts, outs):
        ref = _solo_reference(prompt, ecfg)
        np.testing.assert_array_equal(out, ref)
    # at least the engineered request stopped early
    assert min(lens) < 21, lens


def test_serving_snapkv_matches_solo():
    """SnapKV self-spec through the serving engine (the generic masked window,
    not a streamingllm-only path)."""
    ecfg = _ecfg(max_gen=10, mode="snapkv")
    prompts = _prompts(3, 40, seed=5)  # prefix ≡ window (mod chunk)
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo_reference(prompt, ecfg))


@pytest.mark.parametrize("mode,prefix", [("full", 48), ("streamingllm", 48)])
def test_serving_longspec_matches_solo(mode, prefix):
    """Standalone-draft serving: each served request must reproduce its own
    fixed-batch LongSpecEngine run exactly."""
    ecfg = _ecfg(max_gen=10, mode=mode)
    prompts = _prompts(3, prefix, seed=7)
    engine = ServingLongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)

    solo = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg)
    for prompt, out in zip(prompts, outs):
        st = solo.encode(jnp.asarray(prompt)[None])
        st, stats = solo.generate(st)
        n = int(np.asarray(stats["num_committed"])[0])
        ref = np.asarray(stats["output"])[0, :n]
        np.testing.assert_array_equal(out, ref)


def test_serving_sampled_matches_solo():
    """Sampling through the serving engine: each request's served tokens equal
    its solo sampled run (same rng, salt = request id), even across slot
    recycling — recycled slots never replay a previous occupant's stream."""
    import jax

    key = jax.random.PRNGKey(77)
    ecfg = dataclasses.replace(_ecfg(max_gen=12), temperature=0.8, top_p=0.9)
    prompts = _prompts(5, 48, seed=13)
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2, rng=key)
    assert len(outs) == 5
    solo = SpecEngine(PARAMS, CFG, ecfg)
    for rid, (prompt, out) in enumerate(zip(prompts, outs)):
        st = solo.encode(jnp.asarray(prompt)[None], rng=key,
                         salt=jnp.asarray([rid], jnp.int32))
        _, stats = solo.generate(st)
        n = int(np.asarray(stats["num_committed"])[0])
        np.testing.assert_array_equal(out, np.asarray(stats["output"])[0, :n])


def test_serving_mixed_prompt_lengths_matches_solo():
    """VERDICT r1 item 5: variable-length admission.  Prompts of different
    lengths are bucketed per admission wave (admit_many) and coexist in the
    batch; every request must still reproduce its solo run exactly."""
    ecfg = _ecfg(max_gen=12)
    rng = np.random.RandomState(21)
    lengths = [48, 32, 48, 64, 32, 16]
    prompts = [rng.randint(0, CFG.vocab_size, size=n).astype(np.int32)
               for n in lengths]
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=3, windows_per_sync=2)
    assert len(outs) == len(prompts)
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo_reference(prompt, ecfg))
    # the first wave fills all 3 free slots in one admit_many call
    assert engine.last_serve_stats["mean_admissions_per_wave"] > 1.0


def test_serving_batched_admission_single_wave():
    """A wave of equal-length admissions prefills as ONE batched encode."""
    ecfg = _ecfg(max_gen=8)
    prompts = _prompts(4, 48, seed=31)
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=4, windows_per_sync=2)
    stats = engine.last_serve_stats
    assert stats["admission_waves"] == 1 and stats["served"] == 4
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo_reference(prompt, ecfg))


def test_serving_page_budget_backpressure():
    """VERDICT r1 item 5: the native PageAllocator gates admission.  With a
    page budget that holds only ~1.5 requests' reservations, admissions are
    FCFS-throttled (more waves, head-of-line waits for released pages), yet
    every request still reproduces its solo run and the page floor is hit."""
    ecfg = _ecfg(max_gen=10)
    prompts = _prompts(4, 48, seed=41)
    # one request reserves ceil((48 + 10 + 3 + 2)/128) = 1 page; budget 1
    # page => strictly serial admission even though B=2 slots exist
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2, total_pages=1)
    stats = engine.last_serve_stats
    assert stats["admission_waves"] >= 4  # serial: one request per wave
    assert stats["mean_admissions_per_wave"] == 1.0
    assert stats["min_free_pages"] == 0
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo_reference(prompt, ecfg))

    # generous budget: both slots fill in the first wave
    engine2 = ServingEngine(PARAMS, CFG, ecfg)
    outs2 = engine2.serve(prompts, B=2, windows_per_sync=2, total_pages=8)
    assert engine2.last_serve_stats["mean_admissions_per_wave"] > 1.0
    for a, b in zip(outs, outs2):
        np.testing.assert_array_equal(a, b)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="total_pages"):
        engine2.serve(prompts, B=2, total_pages=0)
