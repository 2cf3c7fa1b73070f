"""Draft-step component breakdown on the real chip (VERDICT r1 item 4).

Decomposes one self-spec draft step (llama-3.2-1b shapes, int8 draft weights)
into: full step / dots-only (attention replaced by q) / attend+append-only /
head-only chains, each timed with the donated two-chain slope estimator
(engine/profiling._chain — a single readback per chain; block_until_ready does
not synchronize through the relay).

Usage:  python scripts/profile_draft.py [--B 32] [--budget 513] [--iters 30]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama-3.2-1b")
    p.add_argument("--B", type=int, default=32)
    p.add_argument("--budget", type=int, default=513)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--draft_quant", default="int8", choices=["int8", "int4", "none"])
    p.add_argument("--quant_backend", default="pallas", choices=["jnp", "pallas"])
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    args = p.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bench import make_params
    from magicdec_tpu import quantization as Q
    from magicdec_tpu.config import ModelConfig
    from magicdec_tpu.engine.profiling import _chain
    from magicdec_tpu.models import llama as M
    from magicdec_tpu.ops import attention as attn_ops

    Q.set_matmul_backend(args.quant_backend)
    cfg = ModelConfig.from_name(args.model)
    params = M.fuse_exec_params(make_params(cfg), cfg)
    if args.draft_quant != "none":
        dparams = Q.quantize_params(params,
                                    bits=8 if args.draft_quant == "int8" else 4,
                                    include_head=True,
                                    materialize_tied_head=True)
    else:
        dparams = params
    B = args.B
    cap = ((args.budget + 96) + 127) // 128 * 128
    hd, Hq, Hkv = cfg.head_dim, cfg.n_head, cfg.n_kv_head
    D = cfg.dim
    dshape = (cfg.n_layer, B, cap, Hkv * hd)
    fill_np = np.full((B,), args.budget, np.int32)

    def zeros_x():
        return jnp.zeros((B, 1, D), jnp.bfloat16)

    # ---- full draft step (token -> token), cache rebuilt per measurement
    def full_state():
        return (jnp.zeros((B, 1), jnp.int32), jnp.asarray(fill_np),
                {"dk": jnp.zeros(dshape, jnp.bfloat16),
                 "dv": jnp.zeros(dshape, jnp.bfloat16)})

    def full_step(st, w):
        tok, fill, caches = st
        nxt, caches = M.forward_draft(w, cfg, tok, fill, fill, caches,
                                      backend="flash")
        return (nxt, fill + 1, caches)

    # ---- dots-only: the layer scan with attention output replaced by the
    # q projection (same dot shapes/weights, no attend/rope/append kernels)
    def dots_state():
        return (zeros_x(),)

    def dots_step(st, w):
        (x,) = st

        def body(carry, wl):
            x = carry
            # pre-norms now live INSIDE _qkv/_mlp (fused into the quantized
            # dots on the pallas path), so this chain times dots+their fused
            # elementwise — the remaining glue is rope/reshape/residuals
            q, k, v = M._qkv(x, wl, cfg)
            out = q.reshape(B, 1, Hq * hd)
            h = x + M.matmul(out, wl["wo"])
            h = h + M._mlp(h, wl, cfg)
            return h, None

        x, _ = jax.lax.scan(body, x, w["layers"])
        return (x,)

    # ---- attend+append-only: per layer, attend_cache with fixed fresh rows
    def attend_state():
        return (zeros_x(),
                {"dk": jnp.zeros(dshape, jnp.bfloat16),
                 "dv": jnp.zeros(dshape, jnp.bfloat16)})

    def attend_step(st, w):
        x, caches = st
        fill = jnp.asarray(fill_np)

        def body(carry, l):
            x, caches = carry
            q = jnp.broadcast_to(x[:, :, None, :hd], (B, 1, Hq, hd))
            rows = {"k": x[:, :, :Hkv * hd], "v": x[:, :, :Hkv * hd]}
            out = attn_ops.attend_cache(q, caches, fill, layer=l,
                                        backend="flash", prefix="d",
                                        fresh=rows)
            return (x + out.reshape(B, 1, Hq * hd)[:, :, :D], caches), rows

        (x, caches), rows = jax.lax.scan(body, (x, caches),
                                         jnp.arange(cfg.n_layer))
        caches = M._append_rows(caches, rows, fill, prefix="d",
                                backend="flash")
        return (x, caches)

    # ---- head only
    def head_state():
        return (zeros_x(),)

    def head_step(st, w):
        (x,) = st
        t = M.head_argmax(w, cfg, x)
        return (x + t[..., None].astype(x.dtype) * 1e-9,)

    results = {}
    results["full_draft_step_ms"] = _chain(
        full_step, args.iters, full_state, dparams)() * 1e3
    results["dots_only_ms"] = _chain(
        dots_step, args.iters, dots_state, dparams)() * 1e3
    results["head_only_ms"] = _chain(
        head_step, args.iters, head_state, dparams)() * 1e3
    try:
        results["attend_append_ms"] = _chain(
            attend_step, args.iters, attend_state, dparams)() * 1e3
    except Exception as exc:  # pragma: no cover - diagnostic path
        results["attend_append_ms"] = float("nan")
        print(f"[profile_draft] attend chain failed: {exc}", file=sys.stderr)

    # per-dot-kind chains
    for key in ("wqkv", "wo", "w13", "w2"):
        w0 = jax.tree.map(lambda a: a[0], dparams["layers"][key],
                          is_leaf=lambda a: hasattr(a, "shape"))
        In = (w0.q.shape[0] * (2 if w0.bits == 4 else 1)
              if Q.is_quantized(w0) else w0.shape[0])

        def mk(In=In):
            return (jnp.zeros((B, In), jnp.bfloat16),)

        def step(st, w, In=In):
            (x,) = st
            y = M.matmul(x, w)
            if y.shape[1] >= In:
                return (y[:, :In],)
            reps = -(-In // y.shape[1])
            return (jnp.tile(y, (1, reps))[:, :In],)

        results[f"dot_{key}_x{cfg.n_layer}_ms"] = _chain(
            step, args.iters * 4, mk, w0)() * 1e3 * cfg.n_layer

    for k, v in results.items():
        print(f"{k:28s} {v:8.3f}")


if __name__ == "__main__":
    main()
