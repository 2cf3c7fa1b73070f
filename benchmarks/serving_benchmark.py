"""Continuous-batching serving driver (no reference equivalent — the
reference's batches are fixed-membership with batch-global termination,
SURVEY.md §2.2; this measures the request-level serving engine,
engine/serving.py).

A stream of equal-length requests is served through a fixed number of batch
slots with speculative decoding; finished slots are recycled with
freshly-prefilled queued prompts.  Reports end-to-end serving throughput
(committed tokens / wall time, admissions included) and request rate.

Example:
  python benchmarks/serving_benchmark.py --model llama-3.2-1b --slots 8 \
      --num_requests 24 --prefix_len 4000 --max_len 4608
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser())
    p.add_argument("--mode", default="streamingllm",
                   choices=["streamingllm", "snapkv", "full"])
    p.add_argument("--draft_model", type=str, default=None,
                   help="standalone draft checkpoint/config (serving longspec)")
    p.add_argument("--slots", type=int, default=4, help="batch slots")
    p.add_argument("--num_requests", type=int, default=12)
    p.add_argument("--gamma", type=int, default=3)
    p.add_argument("--draft_budget", type=int, default=257)
    p.add_argument("--max_gen", type=int, default=80)
    p.add_argument("--windows_per_sync", type=int, default=4)
    p.add_argument("--paged", action="store_true",
                   help="serve over a shared KV page POOL (PagedServing*: "
                        "capacity = sum of request lengths, native "
                        "PageAllocator page tables on device)")
    p.add_argument("--page_size", type=int, default=2048)
    p.add_argument("--total_pages", type=int, default=0,
                   help="pool size in pages (0 = full B*npr capacity); "
                        "below capacity, FCFS admission blocks on pages")
    p.add_argument("--ragged", action="store_true",
                   help="draw prompt lengths uniformly in "
                        "[prefix_len//2, prefix_len] (paged capacity demo)")
    args = p.parse_args()
    common.apply_platform(args)

    from magicdec_tpu.engine.engine import EngineConfig
    from magicdec_tpu.engine.serving import (
        PagedServingEngine, PagedServingLongSpecEngine, ServingEngine,
        ServingLongSpecEngine)
    from magicdec_tpu.utils.seeding import setup_seed

    setup_seed(args.seed)
    params, cfg = common.load_params_and_config(args.model)
    prefix = args.prefix_len
    if args.mode == "snapkv":
        prefix = (prefix // 128) * 128 + 32  # reference shape contract
        args.prefix_len = prefix  # the data loader windows by prefix_len
    ecfg = EngineConfig(
        mode=args.mode, gamma=args.gamma, draft_budget=args.draft_budget,
        max_seq_len=args.max_len, chunk_size=128,
        prefill_chunk_size=min(512, prefix) if prefix % 512 == 0 or prefix % 128 == 0 else 128,
        max_gen=args.max_gen, eot_ids=common.eot_ids_for(args, cfg),
        cache_dtype=jnp.bfloat16, attn_backend=args.attn_backend,
        page_size=args.page_size,
        kv_quant=args.kv_quant or False,
        draft_quant=args.draft_quant or False,
        temperature=args.temperature, top_p=args.top_p)

    # serving under a mesh is TP-only (tests/test_serving_mesh.py): admission
    # buckets have arbitrary sizes a batch axis cannot divide, and the paged
    # pool is one shared structure
    mesh = common.make_mesh_or_none(1, args.model_parallel,
                                    force=args.force_mesh)
    if args.draft_model or args.mode == "full":
        dparams, dcfg = common.load_params_and_config(
            args.draft_model or args.model)
        cls = PagedServingLongSpecEngine if args.paged else ServingLongSpecEngine
        engine = cls(params, cfg, dparams, dcfg, ecfg, mesh=mesh)
    else:
        engine = (PagedServingEngine if args.paged else ServingEngine)(
            params, cfg, ecfg, mesh=mesh)

    data = common.load_dataset(args, cfg.vocab_size)
    lens = [prefix] * args.num_requests
    if args.ragged:
        lrng = np.random.RandomState(args.seed)
        lens = [int(lrng.randint(prefix // 2, prefix + 1))
                for _ in range(args.num_requests)]
    prompts = [np.asarray(data[i % len(data), : lens[i]], np.int32)
               for i in range(args.num_requests)]

    # warmup: compile the windows/admit/encode programs on a short stream
    serve_kw = dict(windows_per_sync=args.windows_per_sync,
                    rng=common.sampling_rng(args))
    if args.paged and args.total_pages:
        serve_kw["total_pages"] = args.total_pages
    engine.serve(prompts[: args.slots], B=args.slots, **serve_kw)

    t0 = time.perf_counter()
    outs = engine.serve(prompts, B=args.slots, **serve_kw)
    dt = time.perf_counter() - t0
    toks = int(sum(len(o) for o in outs))
    print(f"[serving] {args.num_requests} reqs x {prefix} ctx through "
          f"{args.slots} slots: {toks} tokens in {dt:.2f}s "
          f"({toks / dt:.1f} tok/s, {args.num_requests / dt:.2f} req/s)",
          file=sys.stderr)
    st = getattr(engine, "last_serve_stats", None)
    if st:
        print(f"[serving] scheduler: mean queue {st['mean_queue_ms']:.1f}ms, "
              f"mean service {st['mean_service_ms']:.1f}ms "
              f"({st['served']} served)", file=sys.stderr)
        if "total_pages" in st:
            print(f"[serving] pages: {st['total_pages']} total, "
                  f"min free {st['min_free_pages']}", file=sys.stderr)
    print(json.dumps({
        "metric": f"serving{'_paged' if args.paged else ''}_{args.mode}"
                  f"_tokens_per_s_{args.model.split('/')[-1]}"
                  f"_slots{args.slots}_ctx{prefix}",
        "value": round(toks / dt, 2), "unit": "tok/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
