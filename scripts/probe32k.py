"""Minimal 32k-context probe to bisect the worker crash seen in bench at
prefix 32768 (UNAVAILABLE: TPU worker crashed at encode readback).

Runs the pieces one at a time with readbacks between, printing how far it
gets: baseline encode (target prefill only) -> baseline decode -> spec encode
(adds streaming draft prefill) -> one spec window.

Usage: python scripts/probe32k.py [--B 24] [--prefix 32768] [--kv_quant int4]
       [--draft_quant int8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=24)
    p.add_argument("--prefix", type=int, default=32768)
    p.add_argument("--kv_quant", default="int4", choices=["int8", "int4", "none"])
    p.add_argument("--draft_quant", default=None, choices=["int8", "int4"])
    p.add_argument("--quantize", default=None, choices=["int8", "int4"],
                   help="quantize the TARGET weights (self-spec draft shares "
                        "them) — the 32k/B=32 memory plan needs int4")
    p.add_argument("--kv_scale", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--quantize_embed", action="store_true")
    p.add_argument("--seq_round", type=int, default=512)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--max_gen", type=int, default=16)
    p.add_argument("--draft_budget", type=int, default=513)
    p.add_argument("--prefill_chunk", type=int, default=512,
                   help="smaller chunks shrink the [B, C, 2F] prefill "
                        "activation transients (~0.5GiB at C=512/B=32) that "
                        "tip 32k/B=32 over the HBM ceiling")
    args = p.parse_args()

    from magicdec_tpu.config import ModelConfig
    from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
    from bench import make_params

    cfg = ModelConfig.from_name("llama-3.2-1b")
    params = make_params(cfg)
    if args.quantize:
        from magicdec_tpu import quantization as Q
        params = Q.quantize_params(params, bits=8 if args.quantize == "int8" else 4,
                                   include_embed=args.quantize_embed)
        args.draft_quant = None  # draft shares the quantized target weights
    kv = False if args.kv_quant == "none" else args.kv_quant
    seq_round = args.seq_round
    ecfg = EngineConfig(
        mode="streamingllm", gamma=args.gamma, draft_budget=args.draft_budget,
        max_seq_len=((args.prefix + args.max_gen + args.gamma + 2 + seq_round - 1)
                     // seq_round) * seq_round,
        chunk_size=128, prefill_chunk_size=args.prefill_chunk,
        max_gen=args.max_gen,
        eot_ids=(-1,), cache_dtype=jnp.bfloat16, attn_backend="flash",
        kv_quant=kv, draft_quant=args.draft_quant or False,
        kv_scale_dtype=(jnp.bfloat16 if args.kv_scale == "bf16"
                        else jnp.float32))
    eng = SpecEngine(params, cfg, ecfg)
    print(f"[probe] B={args.B} prefix={args.prefix} S={ecfg.max_seq_len} "
          f"kv={kv} dq={args.draft_quant}", flush=True)

    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab_size, (args.B, args.prefix)),
                         jnp.int32)

    def mem(tag):
        try:
            import jax
            s = jax.local_devices()[0].memory_stats() or {}
            used = s.get("bytes_in_use", 0) / 2**30
            peak = s.get("peak_bytes_in_use", 0) / 2**30
            lim = s.get("bytes_limit", 0) / 2**30
            print(f"[probe] mem[{tag}] in_use={used:.2f}GiB "
                  f"peak={peak:.2f}GiB limit={lim:.2f}GiB", flush=True)
        except Exception as e:
            print(f"[probe] mem[{tag}] unavailable: {e}", flush=True)

    mem("start")
    t0 = time.perf_counter()
    st = eng.encode_baseline(prompt)
    print(f"[probe] baseline encode ok tok0={int(np.asarray(st.token0)[0])} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    mem("baseline_encode")
    t0 = time.perf_counter()
    st, stats = eng.generate_baseline(st, max_new=args.max_gen)
    gen = int(np.asarray(stats["gen_tokens"]).sum())
    print(f"[probe] baseline decode ok gen={gen} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    del st

    t0 = time.perf_counter()
    st = eng.encode(prompt)
    print(f"[probe] spec encode ok tok0={int(np.asarray(st.token0)[0])} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    mem("spec_encode")
    t0 = time.perf_counter()
    st, stats = eng.generate(st)
    gen = int(np.asarray(stats["gen_tokens"]).sum())
    steps = int(stats["target_steps"])
    print(f"[probe] spec generate ok gen={gen} steps={steps} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
