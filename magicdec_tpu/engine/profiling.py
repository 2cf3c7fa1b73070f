"""Per-phase timing for the speculation loop (reference --benchmark mode:
tests/SnapKV/selfspec_benchmark.py:118-143 wraps draft/target phases in
cuda-synchronized timers; its backend re-runs single steps without advancing
state via benchmark=True, backend.py:140-144).

Because the engine's production loop is one fused XLA program, phases are
timed here by running isolated jitted step functions chained on-device N times
(a read-back forces completion — plain block_until_ready does not synchronize
through remote-device relays).

Memory discipline: each chain DONATES its state (caches ride the fori carry
on the same buffers) and returns only the computed probe; cache-shaped state
is rebuilt device-side per measurement (timing is value-independent).  An
undonated chain pairs every cache-sized state with a defensive copy — at
int8 8k/B=32 with a quantized draft copy resident that OOMs the chip."""

from __future__ import annotations

import functools
import time
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from magicdec_tpu.models import llama as M


def _chain(fn, n, make_state, weights, repeats: int = 3):
    """Per-iteration seconds of fn(state, weights)->state, measured as the
    difference between an n-chain and a 2n-chain so constant costs (dispatch,
    ~28ms relay readback, the state build) cancel exactly.  state[0] must be
    a COMPUTED array (the probe); weights are non-donated explicit arguments
    (anything closed over becomes a baked-in jit constant, re-uploaded per
    compile)."""
    def make(m):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, weights):
            state = jax.lax.fori_loop(0, m, lambda i, s: fn(s, weights), state)
            return state[0]
        return run

    run1, run2 = make(n), make(2 * n)

    def readback(r):
        float(np.asarray(r).ravel()[0].astype(np.float32))

    def timed():
        readback(run1(make_state(), weights))  # compile + warm
        readback(run2(make_state(), weights))
        estimates = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            readback(run1(make_state(), weights))
            t1 = time.perf_counter()
            readback(run2(make_state(), weights))
            t2 = time.perf_counter()
            estimates.append(((t2 - t1) - (t1 - t0)) / n)
        return float(np.median(estimates))

    return timed


def time_phases_config(engine, B: int, ctx: int,
                       iters: int = 20) -> Dict[str, float]:
    """time_phases without a real state: shapes/lengths derive from the
    engine config (timing is value-independent), so no prefill and no live
    cache state is needed — bench --gamma 0 at bf16 8k/B=32 cannot hold two
    9.5 GB states."""
    from magicdec_tpu.engine.engine import kv_quant_bits

    e, cfg = engine.ecfg, engine.cfg
    dcfg = engine._draft_cfg()
    shape = engine._cache_shape(B, e.max_seq_len)
    bits = kv_quant_bits(e.kv_quant)
    if bits == 4:
        shape = shape[:-1] + (shape[-1] // 2,)
    tshapes = {"k": (shape, jnp.int8 if bits else e.cache_dtype),
               "v": (shape, jnp.int8 if bits else e.cache_dtype)}
    if bits:
        sshape = (cfg.n_layer, B, cfg.n_kv_head, e.max_seq_len)
        tshapes.update(ks=(sshape, e.kv_scale_dtype),
                       vs=(sshape, e.kv_scale_dtype))
    dshape = engine._cache_shape(B, engine._draft_cap, dcfg)
    dshapes = {"dk": (dshape, e.cache_dtype), "dv": (dshape, e.cache_dtype)}
    lens_np = np.full((B,), ctx, np.int32)
    dfill_np = np.full((B,), min(e.draft_budget, ctx), np.int32)
    dpos_np = (lens_np if e.mode == "snapkv" else dfill_np)
    return _time_phases_impl(engine, B, lens_np, dfill_np, dpos_np, tshapes,
                             dshapes, iters)


def time_phases(engine, state, iters: int = 20) -> Dict[str, float]:
    """Milliseconds per single draft step, verify step, and baseline decode
    step at the given state's lengths.  Cache contents are rebuilt as zeros
    (value-independent timing); `state` itself is not consumed."""
    B = state.token0.shape[0]
    # host copies: every leaf of a donated state tuple must be a FRESH device
    # buffer per call (reusing one array would donate it on the first call)
    lens_np = np.asarray(state.target_lens)
    dfill_np = np.asarray(state.draft_fill)
    dpos_np = np.asarray(state.draft_pos)
    tshapes = {k: (v.shape, v.dtype)
               for k, v in engine._state_tcaches(state).items()}
    dshapes = {k: (v.shape, v.dtype)
               for k, v in (("dk", state.dk), ("dv", state.dv))}
    return _time_phases_impl(engine, B, lens_np, dfill_np, dpos_np, tshapes,
                             dshapes, iters)


def _time_phases_impl(engine, B, lens_np, dfill_np, dpos_np, tshapes, dshapes,
                      iters) -> Dict[str, float]:
    cfg = engine._hinted(B)  # same kernel routing as the production loop
    e = engine.ecfg
    dparams, dcfg = engine._draft_model(engine.params)

    def tok():
        return jnp.zeros((B, 1), jnp.int32)

    def make_tcaches():
        return {k: jnp.zeros(s, d) for k, (s, d) in tshapes.items()}

    def make_dcaches():
        return {k: jnp.zeros(s, d) for k, (s, d) in dshapes.items()}

    def draft_step(st, dparams):
        tok, fill, pos, caches = st
        nxt, caches = M.forward_draft(dparams, dcfg, tok, fill, pos, caches,
                                      backend=engine._backend_d)
        return nxt, fill + 1, pos + 1, caches

    def verify_step(st, params):
        buf, lens, caches = st
        out, caches = M.forward_target(params, cfg, buf, lens, caches,
                                       backend=engine._backend_t)
        return jnp.concatenate([out[:, :1], out[:, :-1]], 1), lens, caches

    def baseline_step(st, params):
        tok, lens, caches = st
        nxt, caches = M.forward_target(params, cfg, tok, lens, caches,
                                       backend=engine._backend_t)
        return nxt, lens, caches

    results = {
        "draft_step_ms": _chain(
            draft_step, iters,
            lambda: (tok(), jnp.asarray(dfill_np), jnp.asarray(dpos_np),
                     make_dcaches()), dparams)() * 1e3,
        "verify_step_ms": _chain(
            verify_step, max(2, iters // 2),
            lambda: (jnp.zeros((B, e.gamma + 1), jnp.int32),
                     jnp.asarray(lens_np), make_tcaches()),
            engine.params)() * 1e3,
        "baseline_step_ms": _chain(
            baseline_step, iters,
            lambda: (tok(), jnp.asarray(lens_np), make_tcaches()),
            engine.params)() * 1e3,
    }
    g = e.gamma
    results["window_ms_est"] = results["draft_step_ms"] * g + results["verify_step_ms"]
    return results
