"""Block-shape sweep for the fused dequant-dot kernel on the real chip.

The draft step's w2 dot (8192 -> 2048 at llama-3.2-1b) measured 2.7x its
weight-stream roofline after round 3 capped per-channel in-blocks at 2048
(commit 4a8a1ae, a VMEM fix sized for 8B shapes); this sweeps (block_in,
block_out) per dot shape to pick the fastest legal blocking per shape class.

Usage: python scripts/sweep_quant_blocks.py [--M 32] [--iters 2000]

CAVEAT (measured round 4): the two-chain slope estimator is only
trustworthy when each chain's wall time is >= ~200 ms — at 50 iters of a
~20 us dot the run-to-run variance exceeded ±40% and even produced negative
slopes.  Use --iters large enough that iters * dot_time >= 200 ms, and
arbitrate real decisions with end-to-end decode-loop benches (bench.py).
"""

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


SHAPES = {  # llama-3.2-1b draft dots (In, Out)
    "wqkv": (2048, 3072),
    "wo": (2048, 2048),
    "w13": (2048, 16384),
    "w2": (8192, 2048),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=32)
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    args = p.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from magicdec_tpu import quantization as Q
    from magicdec_tpu.engine.profiling import _chain
    from magicdec_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

    rng = np.random.RandomState(0)
    for name, (In, Out) in SHAPES.items():
        w = jnp.asarray(rng.randn(In, Out).astype(np.float32) / np.sqrt(In))
        wq = Q.quantize_weight(w, bits=args.bits)
        gb = In * Out * (1 if args.bits == 8 else 0.5) / 1e9
        roof_ms = gb / 820 * 1e3
        rows = []
        for bi, bo in itertools.product((512, 1024, 2048, 4096, 8192),
                                        (256, 512, 1024, 2048)):
            if bi > In or In % bi or Out % bo:
                continue
            # VMEM model: double-buffered int8 block + bf16 cast + acc + x
            vmem = 2 * bi * bo * 1 + bi * bo * 2 + args.M * bo * 4 + args.M * bi * 2
            if vmem > 14 * 1024 * 1024:
                continue

            def state(bi=bi):
                return (jnp.asarray(rng.randn(args.M, In).astype(np.float32),
                                    jnp.bfloat16),)

            def step(st, wq, bi=bi, bo=bo):
                (x,) = st
                y = quant_matmul_pallas(x, wq.q, wq.scale, bits=wq.bits,
                                        group_size=wq.group_size,
                                        block_in=bi, block_out=bo)
                if Out >= In:
                    return (y[:, :In],)
                reps = -(-In // Out)
                return (jnp.tile(y, (1, reps))[:, :In],)

            try:
                ms = _chain(step, args.iters, state, wq)() * 1e3
            except Exception as exc:
                print(f"{name} bi={bi} bo={bo}: FAIL {type(exc).__name__}",
                      file=sys.stderr)
                continue
            rows.append((ms, bi, bo))
            print(f"{name:5s} bi={bi:5d} bo={bo:5d}: {ms:7.4f} ms "
                  f"({ms / roof_ms:4.2f}x roofline)", flush=True)
        if rows:
            best = min(rows)
            print(f"--> {name}: best bi={best[1]} bo={best[2]} "
                  f"{best[0]:.4f} ms ({best[0] / roof_ms:.2f}x roofline)",
                  flush=True)


if __name__ == "__main__":
    main()
