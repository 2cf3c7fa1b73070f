"""Paged continuous-batching serving: golden parity vs solo fixed-batch runs.

The paged pool + page tables are a pure storage-layout change: every request
served through the shared pool must produce exactly the tokens the contiguous
fixed-batch engine produces for it alone, including under page backpressure
(total_pages below full capacity) and slot/page recycling."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
from magicdec_tpu.engine.serving import PagedServingEngine
from tests.test_spec_parity import CFG, PARAMS


def _ecfg(max_gen=12, eot=(-1,), mode="streamingllm", **kw):
    return EngineConfig(mode=mode, gamma=3, draft_budget=33,
                        max_seq_len=256, chunk_size=16, window_size=8,
                        sink_size=4, max_gen=max_gen, eot_ids=eot,
                        cache_dtype=jnp.float32, page_size=64, **kw)


def _prompts(lens, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, CFG.vocab_size, size=n).astype(np.int32)
            for n in lens]


def _solo(prompt, ecfg):
    engine = SpecEngine(PARAMS, CFG, ecfg)
    st = engine.encode(jnp.asarray(prompt)[None])
    st, stats = engine.generate(st)
    n = int(np.asarray(stats["num_committed"])[0])
    return np.asarray(stats["output"])[0, :n]


def test_paged_serving_matches_solo_mixed_lengths():
    ecfg = _ecfg(max_gen=10)
    prompts = _prompts([48, 96, 48, 144, 96], seed=3)
    engine = PagedServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)
    assert len(outs) == len(prompts)
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo(prompt, ecfg))


def test_paged_serving_backpressure_total_pages():
    """total_pages below full B-slot capacity: FCFS admission must block on
    pages and still serve everything correctly."""
    ecfg = _ecfg(max_gen=8)
    prompts = _prompts([48, 48, 96, 48], seed=7)
    engine = PagedServingEngine(PARAMS, CFG, ecfg)
    # npr = 4 pages/request cap; 3 slots * 4 = 12 full capacity; give 6
    outs = engine.serve(prompts, B=3, windows_per_sync=1, total_pages=6)
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo(prompt, ecfg))
    assert engine.last_serve_stats["total_pages"] == 6
    assert engine.last_serve_stats["min_free_pages"] >= 0


@pytest.mark.parametrize("kv_quant", ["int8", "int4"])
def test_paged_serving_quantized_pool(kv_quant):
    ecfg = _ecfg(max_gen=8, kv_quant=kv_quant)
    prompts = _prompts([48, 96, 48], seed=11)
    engine = PagedServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo(prompt, ecfg))


def test_paged_serving_flash_interpret():
    """The Pallas paged kernels + aliased paged appends (interpret mode) end
    to end through the serving loop."""
    ecfg = _ecfg(max_gen=8, attn_backend="flash", kv_quant="int8")
    prompts = _prompts([48, 96, 48], seed=13)
    engine = PagedServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)
    for prompt, out in zip(prompts, outs):
        np.testing.assert_array_equal(out, _solo(prompt, ecfg))


def test_paged_serving_sampled_matches_solo():
    """Gumbel-coupled sampling: per-request salts survive paged recycling."""
    import jax

    ecfg = _ecfg(max_gen=8, temperature=0.8, top_p=0.9)
    prompts = _prompts([48, 48, 48], seed=17)
    engine = PagedServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2,
                        rng=jax.random.PRNGKey(0))

    solo = SpecEngine(PARAMS, CFG, ecfg)
    for rid, (prompt, out) in enumerate(zip(prompts, outs)):
        st = solo.encode(jnp.asarray(prompt)[None], rng=jax.random.PRNGKey(0),
                         salt=jnp.asarray([rid], jnp.int32))
        st, stats = solo.generate(st)
        n = int(np.asarray(stats["num_committed"])[0])
        np.testing.assert_array_equal(out, np.asarray(stats["output"])[0, :n])


def test_paged_serving_longspec_matches_solo():
    """Standalone-draft paged serving (PagedServingLongSpecEngine)."""
    from magicdec_tpu.engine.engine import LongSpecEngine
    from magicdec_tpu.engine.serving import PagedServingLongSpecEngine
    from tests.test_longspec import DRAFT_CFG, DRAFT_PARAMS

    ecfg = _ecfg(max_gen=8)
    prompts = _prompts([48, 96, 48], seed=19)
    engine = PagedServingLongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG,
                                        ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)
    for prompt, out in zip(prompts, outs):
        solo = LongSpecEngine(PARAMS, CFG, DRAFT_PARAMS, DRAFT_CFG, ecfg)
        st = solo.encode(jnp.asarray(prompt)[None])
        st, stats = solo.generate(st)
        n = int(np.asarray(stats["num_committed"])[0])
        np.testing.assert_array_equal(out, np.asarray(stats["output"])[0, :n])
