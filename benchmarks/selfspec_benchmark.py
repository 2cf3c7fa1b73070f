"""Self-speculation driver (reference tests/{SnapKV,StreamingLLM}/
selfspec_benchmark.py unified: --mode picks the draft-cache scheme).

Reports the reference's metrics (selfspec:221-250): tokens/s, time per target
step, decoding steps, target steps, avg generated length per target step
(the acceptance proxy).

Example (reference README.md:82/87 shape):
  python benchmarks/selfspec_benchmark.py --mode snapkv --model llama-3.1-8b \
      --B 64 --prefix_len 16032 --max_len 16128 --draft_budget 257 --gamma 3
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser())
    p.add_argument("--mode", default="streamingllm",
                   choices=["streamingllm", "snapkv"])
    p.add_argument("--gamma", type=int, default=3)
    p.add_argument("--draft_budget", type=int, default=257)
    p.add_argument("--max_gen", type=int, default=80)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--warmup_batches", type=int, default=2)
    args = p.parse_args()
    common.apply_platform(args)

    # reference shape contracts (selfspec:36-40)
    assert args.prefix_len < args.max_len
    assert (args.draft_budget - 1) % 128 == 0, "draft budget must be 128k+1"

    from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
    from magicdec_tpu.utils.seeding import setup_seed

    setup_seed(args.seed)
    params, cfg = common.load_params_and_config(args.model)
    mesh = common.make_mesh_or_none(args.data_parallel, args.model_parallel,
                                    force=args.force_mesh)
    ecfg = EngineConfig(mode=args.mode, gamma=args.gamma,
                        draft_budget=args.draft_budget,
                        max_seq_len=args.max_len, max_gen=args.max_gen,
                        eot_ids=common.eot_ids_for(args, cfg),
                        temperature=args.temperature, top_p=args.top_p,
                        attn_backend=args.attn_backend,
                        prefill_chunk_size=args.prefill_chunk,
                        kv_quant=args.kv_quant or False,
                        draft_quant=args.draft_quant or False)
    engine = SpecEngine(params, cfg, ecfg, mesh=mesh)

    data = common.load_dataset(args, cfg.vocab_size)
    total_time, total_tokens, total_steps = 0.0, 0, 0
    from magicdec_tpu.data.datasets import batch_iterator

    for i, batch in enumerate(batch_iterator(data[: args.num_batches * args.B],
                                             args.B)):
        prompt = jnp.asarray(batch[:, : args.prefix_len], jnp.int32)
        st = engine.encode(prompt, rng=common.sampling_rng(args))
        common.force(st.token0)
        with common.Timer() as t:
            st, stats = engine.generate(st)
            gen = int(np.asarray(stats["gen_tokens"]).sum())
        steps = int(stats["target_steps"])
        if i >= args.warmup_batches:
            total_time += t.t
            total_tokens += gen
            total_steps += steps
        print(f"[batch {i}] {gen} tok, {steps} target steps, {t.t:.3f}s "
              f"({gen / t.t:.1f} tok/s, "
              f"{gen / steps / args.B:.2f} tok/step/seq)"
              f"{' [warmup]' if i < args.warmup_batches else ''}",
              file=sys.stderr)
        common.print_output(args, stats)

    if total_time > 0:
        print("total time :{:.5f}s, time per iter :{:.5f}s, decoding step: {}, "
              "large model step: {}".format(total_time, total_time / total_steps,
                                            total_tokens, total_steps))
        print(f"Final tokens per second :{total_tokens / total_time:.2f}")

    if args.benchmark:
        # per-phase timing (reference selfspec:221-223 prints target/draft/
        # verify-loop averages)
        from magicdec_tpu.engine.profiling import time_phases

        st = engine.encode(jnp.asarray(data[: args.B, : args.prefix_len], jnp.int32))
        phases = time_phases(engine, st)
        print("target time :{:.5f}s, draft time :{:.5f}s (per step); "
              "est window: {:.5f}s".format(phases["verify_step_ms"] / 1e3,
                                           phases["draft_step_ms"] / 1e3,
                                           phases["window_ms_est"] / 1e3))

        # gamma autotune (the reference's "Optimal γ" table columns, picked
        # offline there; derived here from the measured acceptance + phase
        # times — engine/autotune.py)
        if total_steps > 0:
            from magicdec_tpu.engine import autotune as AT

            tpw = total_tokens / total_steps / args.B
            alpha = AT.alpha_from_window_stats(tpw, args.gamma)
            g_star = AT.pick_gamma(alpha, phases["draft_step_ms"],
                                   phases["verify_step_ms"])
            pred = (AT.expected_tokens_per_window(alpha, g_star) * args.B
                    / (g_star * phases["draft_step_ms"]
                       + phases["verify_step_ms"]) * 1e3)
            print(f"acceptance alpha: {alpha:.3f}; autotuned gamma: {g_star} "
                  f"(predicted {pred:.1f} tok/s vs measured "
                  f"{total_tokens / total_time:.1f} at gamma={args.gamma})")


if __name__ == "__main__":
    main()
