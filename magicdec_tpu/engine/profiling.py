"""Per-phase timing for the speculation loop (reference --benchmark mode:
tests/SnapKV/selfspec_benchmark.py:118-143 wraps draft/verify phases in
cuda-synchronized timers; its backend re-runs single steps without advancing
state via benchmark=True, backend.py:140-144).

Because the engine's production loop is one fused XLA program, phases are
timed here by running isolated jitted step functions chained on-device N times
(a read-back forces completion — plain block_until_ready does not synchronize
through remote-device relays)."""

from __future__ import annotations

import time
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from magicdec_tpu.models import llama as M


def _chain(fn, n, repeats: int = 3):
    """Per-iteration seconds of fn(x, *args) -> x', measured as the difference
    between an n-chain and a 2n-chain so the constant dispatch + readback
    overhead (~28ms through the remote-device relay) cancels exactly on any
    platform.  Every array (params included) must be an explicit argument —
    anything closed over becomes a baked-in jit constant and gets re-uploaded
    per compile."""
    def make(m):
        @jax.jit
        def run(x, *args):
            return jax.lax.fori_loop(0, m, lambda i, x: fn(x, *args), x)
        return run

    run1, run2 = make(n), make(2 * n)

    def readback(r):
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])

    def timed(*args):
        readback(run1(*args))  # compile + warm
        readback(run2(*args))
        estimates = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            readback(run1(*args))
            t1 = time.perf_counter()
            readback(run2(*args))
            t2 = time.perf_counter()
            estimates.append(((t2 - t1) - (t1 - t0)) / n)
        return float(np.median(estimates))

    return timed


def time_phases(engine, state, iters: int = 20) -> Dict[str, float]:
    """Milliseconds per single draft step, verify step, and baseline decode
    step at the current state's lengths.  State is not modified."""
    cfg = engine.cfg
    e = engine.ecfg
    dparams, dcfg = engine._draft_model(engine.params)
    tok = state.token0[:, None]

    tcaches = engine._state_tcaches(state)

    def draft_step(tok, dparams, dk, dv, fill, pos):
        nxt, _ = M.forward_draft(dparams, dcfg, tok, fill, pos,
                                 {"dk": dk, "dv": dv}, backend=e.attn_backend)
        return nxt

    def verify_step(buf, params, caches, lens):
        out, _ = M.forward_target(params, cfg, buf, lens, caches,
                                  backend=e.attn_backend)
        return out

    def baseline_step(tok, params, caches, lens):
        out, _ = M.forward_target(params, cfg, tok, lens, caches,
                                  backend=e.attn_backend)
        return out

    buf = jnp.tile(tok, (1, e.gamma + 1))
    results = {
        "draft_step_ms": _chain(draft_step, iters)(
            tok, dparams, state.dk, state.dv, state.draft_fill,
            state.draft_pos) * 1e3,
        "verify_step_ms": _chain(verify_step, iters)(
            buf, engine.params, tcaches, state.target_lens) * 1e3,
        "baseline_step_ms": _chain(baseline_step, iters)(
            tok, engine.params, tcaches, state.target_lens) * 1e3,
    }
    g = e.gamma
    results["window_ms_est"] = results["draft_step_ms"] * g + results["verify_step_ms"]
    return results
