"""Standalone-draft speculation driver (reference tests/{SnapKV,StreamingLLM}/
longspec_benchmark.py unified).

--draft_budget -1 selects the uncompressed draft cache (classic spec decode,
reference SnapKV/backend_draft.py:15-21); otherwise --mode picks the
compression scheme.  The reference's draft sub-mesh (--draft_rank_group,
tests/SnapKV/longspec_benchmark.py:99-105: target TP over 8 ranks, draft TP
over a 4-rank subgroup) maps to --model_parallel_outer/--model_parallel_inner:
the target is tensor-parallel over outer*inner devices, the draft over the
inner axis only (parallel/sharding.make_submesh_mesh).

Example (reference README.md:69 shape):
  python benchmarks/longspec_benchmark.py --model llama-3.1-8b \
      --draft_model llama-3.2-1b --B 64 --prefix_len 16032 --max_len 16128 \
      --draft_budget 257 --gamma 3 --mode snapkv
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser())
    p.add_argument("--draft_model", type=str, default="llama-3.2-1b")
    p.add_argument("--mode", default="streamingllm",
                   choices=["streamingllm", "snapkv"])
    p.add_argument("--gamma", type=int, default=3)
    p.add_argument("--draft_budget", type=int, default=257)
    p.add_argument("--max_gen", type=int, default=80)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--warmup_batches", type=int, default=2)
    p.add_argument("--model_parallel_outer", type=int, default=0,
                   help="with --model_parallel_inner: target TP spans "
                        "outer*inner devices, the standalone draft only the "
                        "inner axis (reference --draft_rank_group)")
    p.add_argument("--model_parallel_inner", type=int, default=0)
    p.add_argument("--quantize", choices=["int8", "int4"], default=None,
                   help="quantize the TARGET weights (layer-streamed on-"
                        "device generation for 8B-class synthetic shapes)")
    p.add_argument("--quantize_embed", action="store_true")
    p.add_argument("--baseline", action="store_true",
                   help="also run the target's autoregressive baseline at "
                        "the same shape and report vs_baseline")
    p.add_argument("--target_residual", type=float, default=None,
                   help="coupled synthetic protocol: per-layer residual "
                        "scale of the target stack (default 0.24/sqrt(L) — "
                        "a conservative acceptance ~0.55/token; 0.015 "
                        "calibrates the measured on-chip acceptance into "
                        "the reference's published 0.79-0.84/token band)")
    p.add_argument("--draft_residual", type=float, default=None)
    p.add_argument("--quant_backend", default="pallas",
                   choices=["jnp", "pallas"],
                   help="fused dequant+matmul kernels for quantized weights "
                        "(pallas engages on decode/verify row counts; "
                        "meshless only)")
    args = p.parse_args()
    common.apply_platform(args)
    if args.quantize or args.draft_quant:
        from magicdec_tpu import quantization as Q

        mesh_on = (args.model_parallel > 1 or args.data_parallel > 1
                   or (args.model_parallel_outer and args.model_parallel_inner))
        Q.set_matmul_backend("jnp" if mesh_on else args.quant_backend)

    from magicdec_tpu.engine.engine import EngineConfig, LongSpecEngine
    from magicdec_tpu.utils.seeding import setup_seed

    setup_seed(args.seed)
    if (not str(args.model).endswith(".npz")
            and not str(args.draft_model).endswith(".npz")):
        # synthetic pair: two INDEPENDENTLY random models agree on ~no greedy
        # tokens (acceptance ~0 — longspec throughput would be meaningless),
        # so the synthetic protocol couples them through a shared low-rank
        # bigram backbone (bench.make_longspec_params; acceptance gated on
        # CPU in tests/test_bench_protocol.py)
        from bench import make_longspec_params
        from magicdec_tpu.config import ModelConfig

        cfg = ModelConfig.from_name(args.model)
        dcfg = ModelConfig.from_name(args.draft_model)
        params, dparams = make_longspec_params(
            cfg, dcfg, t_bits=(None if not args.quantize
                               else 8 if args.quantize == "int8" else 4),
            quantize_embed=args.quantize_embed,
            target_residual=args.target_residual,
            draft_residual=args.draft_residual)
    else:
        params, cfg = common.load_params_and_config(args.model)
        dparams, dcfg = common.load_params_and_config(args.draft_model)
        if args.quantize:
            from magicdec_tpu import quantization as Q

            params = Q.quantize_params(
                params, bits=8 if args.quantize == "int8" else 4,
                include_embed=args.quantize_embed)
    mode = "full" if args.draft_budget == -1 else args.mode
    budget = 257 if args.draft_budget == -1 else args.draft_budget
    if args.model_parallel_outer and args.model_parallel_inner:
        from magicdec_tpu.parallel.sharding import make_submesh_mesh

        mesh = make_submesh_mesh(data=args.data_parallel,
                                 model_outer=args.model_parallel_outer,
                                 model_inner=args.model_parallel_inner)
    else:
        mesh = common.make_mesh_or_none(args.data_parallel, args.model_parallel,
                                    force=args.force_mesh)
    ecfg = EngineConfig(mode=mode, gamma=args.gamma, draft_budget=budget,
                        max_seq_len=args.max_len, max_gen=args.max_gen,
                        eot_ids=common.eot_ids_for(args, cfg),
                        temperature=args.temperature, top_p=args.top_p,
                        attn_backend=args.attn_backend,
                        prefill_chunk_size=args.prefill_chunk,
                        kv_quant=args.kv_quant or False,
                        kv_scale_dtype=(jnp.bfloat16 if args.kv_scale == "bf16"
                                        else jnp.float32),
                        draft_quant=args.draft_quant or False,
                        draft_quant_head=args.draft_head == "quant")
    engine = LongSpecEngine(params, cfg, dparams, dcfg, ecfg, mesh=mesh)
    # the engine holds (possibly re-fused/quantized) copies; dropping the
    # driver's refs lets the original leaves free — at 8B the driver-held
    # bf16 draft alone is ~2.3 GB of dead HBM
    del params, dparams

    data = common.load_dataset(args, min(cfg.vocab_size, dcfg.vocab_size))
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
              f"({gen / t.t:.1f} tok/s)"
              f"{' [warmup]' if i < args.warmup_batches else ''}",
              file=sys.stderr)
        common.print_output(args, stats)
        st = stats = None  # free this batch's KV state BEFORE the next
                           # encode allocates its own (2x caches OOMs at 8B)

    if total_time > 0:
        print("total time :{:.5f}s, time per iter :{:.5f}s, decoding step: {}, "
              "large model step: {}".format(total_time, total_time / total_steps,
                                            total_tokens, total_steps))
        print(f"Final tokens per second :{total_tokens / total_time:.2f}")

    base_tps = 0.0
    if args.baseline and total_time > 0:
        # autoregressive baseline on the TARGET at the same shape, so the
        # speedup is self-contained (reference runs tests/baseline_benchmark
        # separately at matching configs, README.md:61)
        bt, btok = 0.0, 0
        for i, batch in enumerate(batch_iterator(
                data[: args.num_batches * args.B], args.B)):
            prompt = jnp.asarray(batch[:, : args.prefix_len], jnp.int32)
            st = engine.encode_baseline(prompt, rng=common.sampling_rng(args))
            common.force(st.token0)
            with common.Timer() as t:
                st, stats = engine.generate_baseline(st, max_new=args.max_gen)
                gen = int(np.asarray(stats["gen_tokens"]).sum())
            if i >= args.warmup_batches:
                bt += t.t
                btok += gen
            print(f"[baseline batch {i}] {gen} tok, {t.t:.3f}s "
                  f"({gen / t.t:.1f} tok/s)"
                  f"{' [warmup]' if i < args.warmup_batches else ''}",
                  file=sys.stderr)
            st = stats = None
        base_tps = btok / bt if bt > 0 else 0.0
        print(f"Baseline tokens per second :{base_tps:.2f}")

    if total_time > 0:
        import json

        tps = total_tokens / total_time
        qtag = f"_{args.quantize}" if args.quantize else ""
        qtag += f"_kvq{args.kv_quant[3:]}" if args.kv_quant else ""
        qtag += f"_dq{args.draft_quant[3:]}" if args.draft_quant else ""
        print(json.dumps({
            "metric": f"longspec_{mode}_tokens_per_s_{args.model}"
                      f"_draft_{args.draft_model}{qtag}_B{args.B}"
                      f"_ctx{args.prefix_len}",
            "value": round(tps, 2), "unit": "tok/s",
            "vs_baseline": round(tps / base_tps, 4) if base_tps else 1.0,
            "tokens_per_step": round(
                total_tokens / max(total_steps, 1) / args.B, 3),
        }))


if __name__ == "__main__":
    main()
