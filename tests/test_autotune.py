"""Gamma autotuner (engine/autotune.py): acceptance model, inversion, argmax.

The reference picks gamma offline per config (BASELINE.md "Optimal γ"
columns); these tests pin the analytic selection to its published shape:
higher acceptance / cheaper drafts -> larger gamma.
"""

import numpy as np
import pytest

from magicdec_tpu.engine import autotune as AT


def test_expected_tokens_limits():
    assert AT.expected_tokens_per_window(0.0, 4) == 1.0
    assert AT.expected_tokens_per_window(1.0, 4) == 5.0
    # strictly increasing in both arguments
    assert (AT.expected_tokens_per_window(0.8, 4)
            > AT.expected_tokens_per_window(0.5, 4)
            > AT.expected_tokens_per_window(0.5, 2))


def test_alpha_inversion_roundtrip():
    for alpha in (0.1, 0.5, 0.79, 0.84, 0.95):
        for gamma in (2, 3, 4, 6):
            t = AT.expected_tokens_per_window(alpha, gamma)
            back = AT.alpha_from_window_stats(t, gamma)
            np.testing.assert_allclose(back, alpha, atol=1e-4)
    assert AT.alpha_from_window_stats(1.0, 4) == 0.0
    assert AT.alpha_from_window_stats(5.0, 4) == 1.0


def test_pick_gamma_monotone_in_alpha_and_cost():
    td, tv = 1.0, 4.0
    gs = [AT.pick_gamma(a, td, tv) for a in (0.2, 0.5, 0.8, 0.95)]
    assert gs == sorted(gs), gs               # better drafts -> longer windows
    assert AT.pick_gamma(0.95, td, tv) >= 4
    assert AT.pick_gamma(0.05, td, tv) == 1   # hopeless draft -> shortest
    # expensive drafts shrink the window
    assert AT.pick_gamma(0.8, 3.0, 4.0) <= AT.pick_gamma(0.8, 0.5, 4.0)


def test_pick_gamma_matches_brute_force():
    rng = np.random.RandomState(0)
    cands = (1, 2, 3, 4, 5, 6, 8)
    for _ in range(50):
        a = float(rng.uniform(0, 1))
        td = float(rng.uniform(0.1, 3.0))
        tv = float(rng.uniform(0.5, 10.0))
        best = max(cands, key=lambda g: AT.expected_tokens_per_window(a, g)
                   / (g * td + tv))
        assert AT.pick_gamma(a, td, tv, cands) == best


def test_pick_gamma_from_run_realistic():
    # README-measured regime: alpha ~= 0.79-0.84, draft ~ 1/4 the verify cost
    # -> the reference's optimal gamma of 3-4 falls out
    t_obs = AT.expected_tokens_per_window(0.82, 4)
    g = AT.pick_gamma_from_run(t_obs, 4, td=1.0, tv=4.0)
    assert g in (3, 4, 5)


def test_validation():
    with pytest.raises(ValueError):
        AT.expected_tokens_per_window(1.5, 3)
    with pytest.raises(ValueError):
        AT.pick_gamma(0.5, 1.0, 0.0, (1, 2))
    with pytest.raises(ValueError):
        AT.pick_gamma(0.5, 1.0, 1.0, ())


def test_time_phases_config_keys():
    """Config-derived phase timing runs without a prefilled state and
    returns the td/tv the autotuner consumes (CPU, tiny shapes)."""
    import jax.numpy as jnp

    from magicdec_tpu.config import tiny_config
    from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
    from magicdec_tpu.engine.profiling import time_phases_config
    from tests.test_spec_parity import _random_params

    cfg = tiny_config(vocab_size=128, n_layer=2, n_head=4, n_kv_head=2,
                      dim=64, intermediate_size=128)
    eng = SpecEngine(_random_params(cfg, seed=2), cfg,
                     EngineConfig(mode="streamingllm", gamma=2,
                                  draft_budget=33, max_seq_len=128,
                                  chunk_size=16, window_size=8, sink_size=4,
                                  max_gen=8, eot_ids=(-1,),
                                  cache_dtype=jnp.float32))
    ph = time_phases_config(eng, B=2, ctx=64, iters=2)
    for k in ("draft_step_ms", "verify_step_ms", "baseline_step_ms",
              "window_ms_est"):
        assert k in ph and np.isfinite(ph[k])
