"""Perplexity gate driver (no reference equivalent — SURVEY.md §4 notes the
reference has no accuracy evaluation; §7 M5 requires a perplexity gate for
quantized checkpoints).

Evaluates teacher-forced perplexity over PG-19-style windows (synthetic
fallback in the zero-egress environment) for a checkpoint, optionally
comparing bf16 vs int8/int4 weight-only quantization of the same weights.

Example:
  python benchmarks/perplexity_benchmark.py --model checkpoints/.../model.npz \
      --seq_len 2048 --B 4 --compare int8
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser())
    p.add_argument("--seq_len", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--num_seqs", type=int, default=8)
    p.add_argument("--quantize", choices=["int8", "int4"], default=None,
                   help="evaluate the quantized model only")
    p.add_argument("--compare", choices=["int8", "int4", "kv_int8", "kv_int4"],
                   default=None,
                   help="evaluate full precision AND this quantization "
                        "(kv_int8/kv_int4 = quantized KV cache, weights "
                        "untouched); the JSON line reports the quantized ppl "
                        "with vs_baseline = ppl_quant / ppl_full")
    args = p.parse_args()
    common.apply_platform(args)

    from magicdec_tpu import quality
    from magicdec_tpu import quantization as Q
    from magicdec_tpu.utils.seeding import setup_seed

    setup_seed(args.seed)
    params, cfg = common.load_params_and_config(args.model)
    args.prefix_len = args.seq_len  # the data loader windows by prefix_len
    data = common.load_dataset(args, cfg.vocab_size)[: args.num_seqs]

    def run(ps, tag, kv_quant=None):
        kv = (args.kv_quant or False) if kv_quant is None else kv_quant
        ppl, nll = quality.perplexity(ps, cfg, data, batch_size=min(args.B, len(data)),
                                      chunk_size=args.chunk,
                                      backend=args.attn_backend, kv_quant=kv)
        print(f"[ppl] {tag}{f'+kv_{kv}' if kv else ''}: ppl={ppl:.4f} "
              f"nll/token={nll:.5f} ({len(data)} x {args.seq_len} tokens)",
              file=sys.stderr)
        return ppl

    if args.compare in ("kv_int8", "kv_int4"):
        ppl_full = run(params, "bf16", kv_quant=False)
        ppl_q = run(params, "bf16", kv_quant=args.compare.removeprefix("kv_"))
        print(json.dumps({
            "metric": f"perplexity_{args.compare}_{args.model.split('/')[-1]}",
            "value": round(ppl_q, 4), "unit": "ppl",
            "vs_baseline": round(ppl_q / ppl_full, 6),
        }))
        return

    if args.compare:
        bits = 8 if args.compare == "int8" else 4
        ppl_full = run(params, "bf16")
        ppl_q = run(Q.quantize_params(params, bits=bits), args.compare)
        print(json.dumps({
            "metric": f"perplexity_{args.compare}_{args.model.split('/')[-1]}",
            "value": round(ppl_q, 4), "unit": "ppl",
            "vs_baseline": round(ppl_q / ppl_full, 6),
        }))
        return

    if args.quantize:
        params = Q.quantize_params(params, bits=8 if args.quantize == "int8" else 4)
    tag = args.quantize or "bf16"
    ppl = run(params, tag)
    print(json.dumps({
        "metric": f"perplexity_{tag}_{args.model.split('/')[-1]}",
        "value": round(ppl, 4), "unit": "ppl", "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
