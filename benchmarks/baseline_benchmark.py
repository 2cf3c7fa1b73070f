"""Autoregressive baseline driver (reference tests/baseline_benchmark.py).

Protocol parity: PG-19 windows (synthetic fallback), batches of B, prefill
then ~max_gen greedy tokens, timers over the decode loop, warmup batches
excluded (reference :84-104, timers reset after batch 5).

Example:
  python benchmarks/baseline_benchmark.py --model llama-3.2-1b --B 8 \
      --prefix_len 4000 --max_len 4096 --model_parallel 1
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser())
    p.add_argument("--max_gen", type=int, default=80)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--warmup_batches", type=int, default=2)
    args = p.parse_args()
    common.apply_platform(args)

    from magicdec_tpu.config import ModelConfig
    from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
    from magicdec_tpu.utils.seeding import setup_seed

    setup_seed(args.seed)
    params, cfg = common.load_params_and_config(args.model)
    mesh = common.make_mesh_or_none(args.data_parallel, args.model_parallel,
                                    force=args.force_mesh)
    ecfg = EngineConfig(mode="streamingllm", max_seq_len=args.max_len,
                        max_gen=args.max_gen, eot_ids=common.eot_ids_for(args, cfg),
                        temperature=args.temperature, top_p=args.top_p,
                        attn_backend=args.attn_backend,
                        prefill_chunk_size=args.prefill_chunk,
                        kv_quant=args.kv_quant or False)
    engine = SpecEngine(params, cfg, ecfg, mesh=mesh)

    data = common.load_dataset(args, cfg.vocab_size)
    total_time, total_tokens = 0.0, 0
    from magicdec_tpu.data.datasets import batch_iterator

    for i, batch in enumerate(batch_iterator(data[: args.num_batches * args.B],
                                             args.B)):
        prompt = jnp.asarray(batch[:, : args.prefix_len], jnp.int32)
        st = engine.encode_baseline(prompt, rng=common.sampling_rng(args))
        common.force(st.token0)
        with common.Timer() as t:
            st, stats = engine.generate_baseline(st, max_new=args.max_gen)
            gen = int(np.asarray(stats["gen_tokens"]).sum())
        if i >= args.warmup_batches:
            total_time += t.t
            total_tokens += gen
        print(f"[batch {i}] {gen} tokens in {t.t:.3f}s "
              f"({gen / t.t:.1f} tok/s){' [warmup]' if i < args.warmup_batches else ''}",
              file=sys.stderr)
        common.print_output(args, stats)

    if total_time > 0:
        print(f"Final tokens per second :{total_tokens / total_time:.2f}")


if __name__ == "__main__":
    main()
