"""Attention-kernel microbenchmarks: Pallas flash kernels vs their XLA paths.

The reference has no kernel-level benchmark (its kernels live in flashinfer);
this driver times each hot attention kernel in isolation at serving shapes so
regressions and backend-dispatch decisions (ops/attention.py attend_auto*) are
grounded in measured numbers on the actual chip.

Timing protocol per CLAUDE.md: N iterations chained inside one jitted
fori_loop with a real data dependence (the kernel output feeds the next
iteration's queries), one host readback at the end; plain block_until_ready
does not synchronize through the remote-device relay.

Usage (real TPU, ~2-4 min including compiles):
    python benchmarks/kernel_benchmark.py --B 32 --S 8704 --C 512
CPU sanity (tiny shapes, interpretable):
    python benchmarks/kernel_benchmark.py --platform cpu --B 2 --S 512 \
        --C 128 --iters 3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--model", default="llama-3.2-1b")
    p.add_argument("--B", type=int, default=32)
    p.add_argument("--S", type=int, default=8704,
                   help="cache capacity (tile of 512)")
    p.add_argument("--C", type=int, default=512, help="prefill chunk rows")
    p.add_argument("--T", type=int, default=5,
                   help="verify window gamma+1 for the decode kernels")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--which", default="all",
                   choices=["all", "decode", "prefill", "append", "paged"])
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from magicdec_tpu.config import ModelConfig
    from magicdec_tpu.engine.profiling import _chain
    from magicdec_tpu.ops import attention as A
    from magicdec_tpu.ops import kv_cache as kv_ops
    from magicdec_tpu.ops.pallas.decode_attention import (
        flash_decode_attend, flash_decode_attend_quant)
    from magicdec_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attend, flash_prefill_attend_quant)

    cfg = ModelConfig.from_name(args.model)
    B, S, C, T = args.B, args.S, args.C, args.T
    Hq, Hkv, hd = cfg.n_head, cfg.n_kv_head, cfg.head_dim
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    k4 = jnp.asarray(rng.randn(B, S, Hkv, hd), dt)
    v4 = jnp.asarray(rng.randn(B, S, Hkv, hd), dt)
    k, v = k4.reshape(B, S, Hkv * hd), v4.reshape(B, S, Hkv * hd)
    kq, ks = kv_ops.quantize_kv_tokens(k4)
    vq, vs = kv_ops.quantize_kv_tokens(v4)
    block_s = 512 if S % 512 == 0 else 128
    interp = jax.default_backend() == "cpu"

    results = {}

    def bench(name, fn, q, *rest):
        # _chain contract (engine/profiling.py): fn(state, weights) -> state,
        # state donated and rebuilt per call, state[0] is the computed probe
        t = _chain(lambda st, w: (fn(st[0], *w),), args.iters,
                   lambda: (q + 0,), tuple(rest))() * 1e3
        results[name] = round(t, 3)
        print(f"[kernel] {name:32s} {t:8.3f} ms", file=sys.stderr)

    if args.which in ("all", "decode"):
        for t in sorted({1, T}):
            q = jnp.asarray(rng.randn(B, t, Hq, hd), dt)
            lens = jnp.full((B,), S - t, jnp.int32)
            bench(f"decode_T{t}_xla", lambda x, k, v, l: A.attend(x, k, v, l),
                  q, k, v, lens)
            bench(f"decode_T{t}_flash",
                  lambda x, k, v, l: flash_decode_attend(x, k, v, l,
                                                         block_s=block_s,
                                                         interpret=interp),
                  q, k, v, lens)
            bench(f"decode_T{t}_int8_xla",
                  lambda x, k, ks, v, vs, l: A.attend_quant(x, k, ks, v, vs, l),
                  q, kq, ks, vq, vs, lens)
            bench(f"decode_T{t}_int8_flash",
                  lambda x, k, ks, v, vs, l: flash_decode_attend_quant(
                      x, k, ks, v, vs, l, block_s=block_s, interpret=interp),
                  q, kq, ks, vq, vs, lens)

    if args.which in ("all", "prefill"):
        q = jnp.asarray(rng.randn(B, C, Hq, hd), dt)
        lens = jnp.full((B,), S - C, jnp.int32)
        br = min(512, (Hq // Hkv) * C)
        bench("prefill_flash",
              lambda x, k, v, l: flash_prefill_attend(x, k, v, l,
                                                      block_s=block_s,
                                                      block_r=br,
                                                      interpret=interp),
              q, k, v, lens)
        bench("prefill_int8_flash",
              lambda x, k, ks, v, vs, l: flash_prefill_attend_quant(
                  x, k, ks, v, vs, l, block_s=block_s, block_r=br,
                  interpret=interp),
              q, kq, ks, vq, vs, lens)

        def dequant_then_flash(x, k, ks, v, vs, l):
            kd = kv_ops.dequant_kv(k, ks, hd, x.dtype)
            vd = kv_ops.dequant_kv(v, vs, hd, x.dtype)
            return flash_prefill_attend(x, kd, vd, l, block_s=block_s,
                                        block_r=br, interpret=interp)

        bench("prefill_int8_dequant_flash", dequant_then_flash,
              q, kq, ks, vq, vs, lens)

    if args.which in ("all", "append"):
        # in-place cache appends at decode/verify shapes over the layer stack
        # (cost is independent of S beyond the block clamp; small S keeps the
        # carried caches cheap to rebuild).  Caches ride the donated chain
        # state like the engine's scan carry.
        L = cfg.n_layer
        Sa = 2048
        Kc = Hkv * hd
        pos = jnp.full((B,), Sa // 2, jnp.int32)

        def mk_state():
            return (jnp.zeros((1,), jnp.float32),
                    jnp.zeros((L, B, Sa, Kc), jnp.int8),
                    jnp.zeros((L, B, Sa, Kc), jnp.int8),
                    jnp.zeros((L, B, Hkv, Sa), jnp.float32),
                    jnp.zeros((L, B, Hkv, Sa), jnp.float32))

        for t in sorted({1, T}):
            rows = jnp.ones((L, B, t, Kc), jnp.int8)
            srows = jnp.ones((L, B, Hkv, t), jnp.float32)

            def merged(st, w):
                _, ck, cv, sk, sv = st
                pos, rows, srows = w
                ck, cv, sk, sv = kv_ops.append_all_rows_inplace(
                    ck, cv, rows, rows, pos, sk, sv, srows, srows,
                    interpret=interp)
                return (ck[0, 0, 0, :1].astype(jnp.float32) + sv[0, 0, 0, :1],
                        ck, cv, sk, sv)

            def per_array(st, w):
                _, ck, cv, sk, sv = st
                pos, rows, srows = w
                ck = kv_ops.append_rows_inplace(ck, rows, pos, interpret=interp)
                cv = kv_ops.append_rows_inplace(cv, rows, pos, interpret=interp)
                sk = kv_ops.append_scale_rows_inplace(sk, srows, pos,
                                                      interpret=interp)
                sv = kv_ops.append_scale_rows_inplace(sv, srows, pos,
                                                      interpret=interp)
                return (ck[0, 0, 0, :1].astype(jnp.float32) + sv[0, 0, 0, :1],
                        ck, cv, sk, sv)

            for name, fn in ((f"append_T{t}_merged", merged),
                             (f"append_T{t}_per_array", per_array)):
                ms = _chain(fn, args.iters, mk_state, (pos, rows, srows))() * 1e3
                results[name] = round(ms, 3)
                print(f"[kernel] {name:32s} {ms:8.3f} ms", file=sys.stderr)

    if args.which in ("all", "paged"):
        # page-table indirection cost vs the contiguous decode kernel at the
        # same logical shape: one layer of pools, identity-permuted tables
        from magicdec_tpu.ops.pallas import paged_attention as PGA

        ps = 2048 if S % 2048 == 0 else block_s
        npr = S // ps
        perm = rng.permutation(B * npr).astype(np.int32)
        table = jnp.asarray(perm.reshape(B, npr))
        kp = jnp.zeros((1, B * npr, ps, Hkv * hd), dt)
        vp = jnp.zeros((1, B * npr, ps, Hkv * hd), dt)
        kp8 = jnp.zeros((1, B * npr, ps, Hkv * hd), jnp.int8)
        sk8 = jnp.zeros((1, B * npr, Hkv, ps), jnp.float32)
        for t in sorted({1, T}):
            q = jnp.asarray(rng.randn(B, t, Hq, hd), dt)
            lens = jnp.full((B,), S - t, jnp.int32)
            bench(f"paged_decode_T{t}_flash",
                  lambda x, kp, vp, tb, l: PGA.flash_paged_decode_attend(
                      x, kp, vp, tb, l, layer=0, interpret=interp),
                  q, kp, vp, table, lens)
            bench(f"paged_decode_T{t}_int8_flash",
                  lambda x, kp, sk, vp, sv, tb, l:
                      PGA.flash_paged_decode_attend_quant(
                          x, kp, sk, vp, sv, tb, l, layer=0, interpret=interp),
                  q, kp8, sk8, kp8, sk8, table, lens)

    print(json.dumps({"metric": f"kernel_bench_{args.model}_B{B}_S{S}",
                      "value": results.get("decode_T1_flash", 0.0),
                      "unit": "ms", "vs_baseline": 1.0,
                      "detail": results}))


if __name__ == "__main__":
    main()
