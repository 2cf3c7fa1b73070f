"""Decode-phase roofline profile on the real TPU.

Times the spec window's constituent steps in isolation at a given
context/batch so the gap to the HBM roofline is attributable:

  - baseline_step:  1-token target forward incl. the in-place append
  - draft_step:     1-token draft forward over the budget cache
  - verify_step:    (gamma+1)-token target forward incl. append
  - noctx_step:     1-token target forward at lens=0 (weights + overhead,
                    no KV read) -> isolates the non-attention cost
  - head_ms:        final-norm + lm_head matmul + argmax alone

Usage: python scripts/profile_decode.py [--B 32] [--ctx 8192] [--kv_quant int8]
       [--quantize int8] [--gamma 4]

Caches are built directly (no prefill) with random contents; timing does not
depend on values.  Uses the two-chain differencing estimator (CLAUDE.md:
readback costs ~28ms through the relay; block_until_ready does not sync).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _chain(fn, n, repeats=3):
    """Per-iteration seconds of fn(state)->state via (2n-chain - n-chain)/n."""
    def make(m):
        @jax.jit
        def run(state):
            return jax.lax.fori_loop(0, m, lambda i, s: fn(s), state)
        return run

    run1, run2 = make(n), make(2 * n)

    def readback(r):
        # r[1] is each phase state's COMPUTED token/hidden output.  Reading a
        # pass-through element (e.g. params, which jit returns by aliasing its
        # input buffer) would complete without waiting for the computation and
        # time only the dispatch.
        float(np.asarray(r[1]).ravel()[0].astype(np.float32))

    def timed(state):
        readback(run1(state))
        readback(run2(state))
        est = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            readback(run1(state))
            t1 = time.perf_counter()
            readback(run2(state))
            t2 = time.perf_counter()
            est.append(((t2 - t1) - (t1 - t0)) / n)
        return float(np.median(est))

    return timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama-3.2-1b")
    p.add_argument("--B", type=int, default=32)
    p.add_argument("--ctx", type=int, default=8192)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--draft_budget", type=int, default=513)
    p.add_argument("--kv_quant", default=None, choices=["int8", "int4"])
    p.add_argument("--quantize", default=None, choices=["int8", "int4"])
    p.add_argument("--draft_quant", default=None, choices=["int8", "int4"],
                   help="quantized draft-pass weight copy (EngineConfig."
                        "draft_quant): draft_step/head run on it")
    p.add_argument("--quant_backend", default="pallas", choices=["jnp", "pallas"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--seq_round", type=int, default=2048)
    p.add_argument("--phases", default=None,
                   help="comma-separated subset of: baseline_step_ms,"
                        "draft_step_ms,verify_step_ms,noctx_step_ms,head_ms")
    args = p.parse_args()

    from magicdec_tpu.config import ModelConfig
    from magicdec_tpu.models import llama as M
    from bench import make_params

    cfg = ModelConfig.from_name(args.model)
    params = make_params(cfg)
    if args.quantize:
        from magicdec_tpu import quantization as Q
        Q.set_matmul_backend(args.quant_backend)
        params = Q.quantize_params(params, bits=8 if args.quantize == "int8" else 4)
    # engines run the fused execution layout (one QKV dot, one gate/up dot);
    # profile the same program shape
    params = M.fuse_exec_params(params, cfg)
    dparams = params
    if args.draft_quant:
        from magicdec_tpu import quantization as Q
        Q.set_matmul_backend(args.quant_backend)
        dparams = Q.quantize_params(params,
                                    bits=8 if args.draft_quant == "int8" else 4)

    B, ctx, g = args.B, args.ctx, args.gamma
    S = ((ctx + 80 + g + 2 + args.seq_round - 1) // args.seq_round) * args.seq_round
    L, Hkv, hd = cfg.n_layer, cfg.n_kv_head, cfg.head_dim
    K = Hkv * hd
    rng = np.random.RandomState(0)

    # allocate on-device (jnp.zeros/full): host-side randint at these shapes
    # is tens of GB of int64 + a multi-GB relay upload; timing is
    # value-independent (no data-dependent control flow in the kernels)
    # (k/v and ks/vs must be DISTINCT buffers: the in-place appends alias
    # their cache operand, and aliasing one buffer twice forces a copy)
    if args.kv_quant:
        lanes = K // 2 if args.kv_quant == "int4" else K
        caches = {"k": jnp.ones((L, B, S, lanes), jnp.int8),
                  "v": jnp.ones((L, B, S, lanes), jnp.int8),
                  "ks": jnp.full((L, B, Hkv, S), 0.01, jnp.float32),
                  "vs": jnp.full((L, B, Hkv, S), 0.01, jnp.float32)}
    else:
        caches = {"k": jnp.full((L, B, S, K), 0.1, jnp.bfloat16),
                  "v": jnp.full((L, B, S, K), 0.1, jnp.bfloat16)}

    dcap = ((args.draft_budget + 80 + g + 2 + 127) // 128) * 128
    dcaches = {"dk": jnp.full((L, B, dcap, K), 0.1, jnp.bfloat16),
               "dv": jnp.full((L, B, dcap, K), 0.1, jnp.bfloat16)}

    lens = jnp.full((B,), ctx, jnp.int32)
    dfill = jnp.full((B,), args.draft_budget, jnp.int32)
    tok = jnp.zeros((B, 1), jnp.int32)
    buf = jnp.zeros((B, g + 1), jnp.int32)

    def baseline_step(st):
        params, tok, lens, caches = st
        nxt, caches = M.forward_target(params, cfg, tok, lens, caches,
                                       backend="flash")
        return params, nxt, lens + 1, caches

    def noctx_step(st):
        params, tok, lens, caches = st
        nxt, caches = M.forward_target(params, cfg, tok, lens, caches,
                                       backend="flash")
        return params, nxt, lens, caches  # lens stays 0

    def draft_step(st):
        dparams, tok, fill, caches = st
        nxt, caches = M.forward_draft(dparams, cfg, tok, fill, fill, caches,
                                      backend="flash")
        return dparams, nxt, fill + 1, caches

    def verify_step(st):
        params, buf, lens, caches = st
        out, caches = M.forward_target(params, cfg, buf, lens, caches,
                                       backend="flash")
        return params, jnp.concatenate([out[:, :1], out[:, :-1]], 1), \
            lens + g + 1, caches

    def head_only(st):
        params, x = st
        t = M.head_argmax(params, cfg, x)
        return params, x + t[..., None].astype(x.dtype) * 0 + 1e-6

    n = args.iters
    x = jnp.asarray(rng.randn(B, 1, cfg.dim) * 0.1, jnp.bfloat16)
    phases = {
        "baseline_step_ms": (baseline_step, n, (params, tok, lens, caches)),
        "draft_step_ms": (draft_step, n, (dparams, tok, dfill, dcaches)),
        "verify_step_ms": (verify_step, max(2, n // 2),
                           (params, buf, lens, caches)),
        "noctx_step_ms": (noctx_step, n,
                          (params, tok, jnp.zeros((B,), jnp.int32), caches)),
        "head_ms": (head_only, n, (params, x)),
    }
    want = (args.phases.split(",") if args.phases
            else ["baseline_step_ms", "draft_step_ms", "verify_step_ms",
                  "noctx_step_ms", "head_ms"])
    r = {}
    for name in want:
        fn, nn, state = phases[name]
        t0 = time.perf_counter()
        r[name] = _chain(fn, nn)(state) * 1e3
        print(f"{name:28s} {r[name]:10.3f}   (wall {time.perf_counter()-t0:.0f}s)",
              flush=True)

    if "draft_step_ms" in r and "verify_step_ms" in r:
        w = r["draft_step_ms"] * g + r["verify_step_ms"]
        print(f"{'window_ms_est':28s} {w:10.3f}", flush=True)
        print(f"{'tok_per_s_spec_at_3.4':28s} {3.4 * B / w * 1e3:10.3f}", flush=True)
    if "baseline_step_ms" in r:
        print(f"{'tok_per_s_ar':28s} {B / r['baseline_step_ms'] * 1e3:10.3f}",
              flush=True)


if __name__ == "__main__":
    main()
