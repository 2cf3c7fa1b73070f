"""Native FCFS request scheduler (native/runtime.cpp md_sched_* via
magicdec_tpu.native.Scheduler): lifecycle, FCFS ordering, latency stats;
native and Python-fallback backends must agree."""

import numpy as np

from magicdec_tpu import native


def _drive(sched):
    sched.submit(10, 0)
    sched.submit(11, 5)
    sched.submit(12, 9)
    pairs = sched.assign(now_us=10)
    assert pairs == [(10, 0), (11, 1)], pairs  # FCFS into ascending slots
    assert sched.counts() == (1, 2, 0)
    assert sched.assign(now_us=11) == []       # no free slot
    rid = sched.complete(0, now_us=110)
    assert rid == 10
    assert sched.counts() == (1, 1, 1)
    assert sched.assign(now_us=120) == [(12, 0)]
    assert sched.complete(1, now_us=200) == 11
    assert sched.complete(0, now_us=220) == 12
    assert sched.complete(0, now_us=230) == -1  # already free
    assert sched.counts() == (0, 0, 3)
    mean_q, mean_s = sched.stats()
    # queue: 10-0, 10-5, 120-9 -> mean 42; service: 100, 190, 100 -> 130
    np.testing.assert_allclose(mean_q, (10 + 5 + 111) / 3, atol=1e-6)
    np.testing.assert_allclose(mean_s, (100 + 190 + 100) / 3, atol=1e-6)


def test_scheduler_native():
    assert native.have_native(), "g++ toolchain expected"
    _drive(native.Scheduler(2))


def test_scheduler_python_fallback(monkeypatch):
    monkeypatch.setattr(native, "_load", lambda: None)
    s = native.Scheduler(2)
    assert s._lib is None
    _drive(s)


def test_serving_uses_scheduler_stats():
    """serve() publishes scheduler latency stats and still matches solo runs
    (full golden coverage lives in tests/test_serving.py)."""
    import jax.numpy as jnp

    from magicdec_tpu.config import tiny_config
    from magicdec_tpu.engine.engine import EngineConfig
    from magicdec_tpu.engine.serving import ServingEngine
    from tests.test_spec_parity import _random_params

    cfg = tiny_config(vocab_size=128, n_layer=2, n_head=4, n_kv_head=2,
                      dim=64, intermediate_size=128)
    params = _random_params(cfg, seed=3)
    ecfg = EngineConfig(mode="streamingllm", gamma=2, draft_budget=33,
                        max_seq_len=256, chunk_size=16, window_size=8,
                        sink_size=4, max_gen=10, eot_ids=(-1,),
                        cache_dtype=jnp.float32)
    eng = ServingEngine(params, cfg, ecfg)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 128, 48).astype(np.int32) for _ in range(5)]
    outs = eng.serve(prompts, B=2)
    assert len(outs) == 5 and all(len(o) > 0 for o in outs)
    st = eng.last_serve_stats
    assert st["served"] == 5
    assert st["mean_service_ms"] > 0