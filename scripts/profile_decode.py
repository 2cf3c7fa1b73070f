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
       [--quantize int8] [--draft_quant int8] [--gamma 4]

Caches are built directly (no prefill) with constant contents; timing does not
depend on values.  Uses the two-chain differencing estimator (CLAUDE.md:
readback costs ~28ms through the relay; block_until_ready does not sync).

Memory discipline: each chain DONATES its state (caches ride the loop carry on
the same buffers) and returns only the computed probe, and the state is
rebuilt device-side per measurement — an undonated chain would pair every
6 GB cache state with a second 6 GB output copy and OOM at int8 8k/B=32 with
a quantized draft copy resident.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _chain(fn, n, make_state, weights, repeats=3):
    """Per-iteration seconds of fn(state, weights)->state via the
    (2n-chain - n-chain)/n difference.  state[0] must be a COMPUTED array
    (the probe that forces completion); weights are non-donated."""
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
        est = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            readback(run1(make_state(), weights))
            t1 = time.perf_counter()
            readback(run2(make_state(), weights))
            t2 = time.perf_counter()
            est.append(((t2 - t1) - (t1 - t0)) / n)  # state builds cancel
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
                        "draft_quant): draft_step runs on it")
    p.add_argument("--quant_backend", default="pallas", choices=["jnp", "pallas"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--seq_round", type=int, default=2048)
    p.add_argument("--phases", default=None,
                   help="comma-separated subset of: baseline_step_ms,"
                        "draft_step_ms,verify_step_ms,noctx_step_ms,head_ms")
    p.add_argument("--dense_kernels", action="store_true",
                   help="A/B: engage the pallas DENSE fused kernels on the "
                        "target path (measured SLOWER than XLA dots on v5e "
                        "— quantization._DENSE_KERNELS rationale)")
    args = p.parse_args()

    from magicdec_tpu.config import ModelConfig
    from magicdec_tpu.models import llama as M
    from bench import make_params

    cfg = ModelConfig.from_name(args.model)
    params = make_params(cfg)
    # the backend gates the DENSE fused kernels too (round 5) — set it
    # unconditionally, like the engines running under bench.py defaults
    from magicdec_tpu import quantization as Q
    Q.set_matmul_backend(args.quant_backend)
    if args.dense_kernels:
        Q.set_dense_kernels(True)
    if args.quantize:
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
    # the production engines route TARGET matmuls on the decode-rows hint
    # (ModelConfig.decode_rows, engine._hinted); profile the same programs
    import dataclasses as _dc
    hcfg = _dc.replace(cfg, decode_rows=B * (g + 1))
    S = ((ctx + 80 + g + 2 + args.seq_round - 1) // args.seq_round) * args.seq_round
    L, Hkv, hd = cfg.n_layer, cfg.n_kv_head, cfg.head_dim
    K = Hkv * hd

    # state builders allocate on-device per measurement (memset-cheap; host
    # randint at these shapes is tens of GB of int64 + a multi-GB upload;
    # timing is value-independent).  k/v must be DISTINCT buffers: the
    # in-place appends alias their cache operand.
    def make_tcaches():
        if args.kv_quant:
            lanes = K // 2 if args.kv_quant == "int4" else K
            return {"k": jnp.ones((L, B, S, lanes), jnp.int8),
                    "v": jnp.ones((L, B, S, lanes), jnp.int8),
                    "ks": jnp.full((L, B, Hkv, S), 0.01, jnp.float32),
                    "vs": jnp.full((L, B, Hkv, S), 0.01, jnp.float32)}
        return {"k": jnp.full((L, B, S, K), 0.1, jnp.bfloat16),
                "v": jnp.full((L, B, S, K), 0.1, jnp.bfloat16)}

    dcap = ((args.draft_budget + 80 + g + 2 + 127) // 128) * 128

    def make_dcaches():
        return {"dk": jnp.full((L, B, dcap, K), 0.1, jnp.bfloat16),
                "dv": jnp.full((L, B, dcap, K), 0.1, jnp.bfloat16)}

    # every leaf of a donated state tuple must be freshly built per call
    lens = lambda: jnp.full((B,), ctx, jnp.int32)
    tok = lambda: jnp.zeros((B, 1), jnp.int32)
    buf = lambda: jnp.zeros((B, g + 1), jnp.int32)

    def baseline_step(st, params):
        tok, lens, caches = st
        nxt, caches = M.forward_target(params, hcfg, tok, lens, caches,
                                       backend="flash")
        return nxt, lens + 1, caches

    def noctx_step(st, params):
        tok, lens, caches = st
        nxt, caches = M.forward_target(params, hcfg, tok, lens, caches,
                                       backend="flash")
        return nxt, lens, caches  # lens stays 0

    def draft_step(st, dparams):
        tok, fill, caches = st
        nxt, caches = M.forward_draft(dparams, cfg, tok, fill, fill, caches,
                                      backend="flash")
        return nxt, fill + 1, caches

    def verify_step(st, params):
        buf, lens, caches = st
        out, caches = M.forward_target(params, hcfg, buf, lens, caches,
                                       backend="flash")
        return jnp.concatenate([out[:, :1], out[:, :-1]], 1), lens + g + 1, caches

    def head_only(st, params):
        (x,) = st
        t = M.head_argmax(params, hcfg, x)
        return (x + t[..., None].astype(x.dtype) * 0 + 1e-6,)

    n = args.iters
    rng = np.random.RandomState(0)
    x_np = (rng.randn(B, 1, cfg.dim) * 0.1).astype(np.float32)
    phases = {
        "baseline_step_ms": (baseline_step, n,
                             lambda: (tok(), lens(), make_tcaches()), params),
        "draft_step_ms": (draft_step, n,
                          lambda: (tok(), jnp.full((B,), args.draft_budget,
                                                   jnp.int32), make_dcaches()),
                          dparams),
        "verify_step_ms": (verify_step, max(2, n // 2),
                           lambda: (buf(), lens(), make_tcaches()), params),
        "noctx_step_ms": (noctx_step, n,
                          lambda: (tok(), jnp.zeros((B,), jnp.int32),
                                   make_tcaches()), params),
        "head_ms": (head_only, n,
                    lambda: (jnp.asarray(x_np, jnp.bfloat16),), params),
    }
    want = (args.phases.split(",") if args.phases
            else ["baseline_step_ms", "draft_step_ms", "verify_step_ms",
                  "noctx_step_ms", "head_ms"])
    r = {}
    for name in want:
        fn, nn, mk, w = phases[name]
        t0 = time.perf_counter()
        r[name] = _chain(fn, nn, mk, w)() * 1e3
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
