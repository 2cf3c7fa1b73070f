"""Shared driver plumbing for the benchmark CLIs (reference L5 layer,
SURVEY.md §1: tests/baseline_benchmark.py + {SnapKV,StreamingLLM}/
{selfspec,longspec}_benchmark.py)."""

from __future__ import annotations

import argparse
import sys
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--model", type=str, default="llama-3.2-1b",
                   help="config name or converted-checkpoint .npz path")
    p.add_argument("--model_name", type=str, default=None,
                   help="HF tokenizer name (optional; synthetic data if unset)")
    p.add_argument("--dataset", type=str, default="pg19")
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--prefix_len", type=int, default=4000)
    p.add_argument("--max_len", type=int, default=4096)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--printoutput", action="store_true")
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="mesh data axis (reference: torchrun world split)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="mesh model axis (reference: --rank_group TP width)")
    p.add_argument("--compile", action="store_true",
                   help="accepted for reference-CLI parity; jit is always on")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="> 0: exact Gumbel-coupled speculative sampling "
                        "(0 = greedy, the reference's only decode mode)")
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--attn_backend", default="jnp", choices=["jnp", "flash"],
                   help="flash: Pallas TPU kernels on the attention hot path")
    p.add_argument("--kv_quant", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"],
                   help="quantized target KV cache (int8 halves, int4 "
                        "quarters decode HBM traffic)")
    p.add_argument("--draft_head", default="quant", choices=["quant", "shared"],
                   help="shared: a quantized draft-pass copy reuses the "
                        "target's lm_head buffer (no quantized head copy "
                        "materialized) — saves ~0.3-0.5 GB")
    p.add_argument("--draft_quant", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"],
                   help="quantize the DRAFT pass's weights (self-spec: a "
                        "quantized copy of the target; longspec: the "
                        "standalone draft).  Draft decode is weight-HBM-"
                        "bound, and the output still exactly matches the "
                        "full-precision target's")
    p.add_argument("--kv_scale", default="f32", choices=["f32", "bf16"],
                   help="quantized-cache scale dtype (bf16 halves scale "
                        "memory/traffic; spec==AR parity unaffected)")
    p.add_argument("--prefill_chunk", type=int, default=0,
                   help="target prefill chunk size (0 = EngineConfig."
                        "chunk_size; larger chunks feed the MXU better)")
    p.add_argument("--force_mesh", action="store_true",
                   help="build the mesh even at data*model == 1: runs the "
                        "GSPMD + shard_map engine paths (FlashShard kernels, "
                        "sharded state) on a 1-device mesh — the way to "
                        "exercise the TP code path on a single real chip")
    p.add_argument("--platform", choices=["default", "cpu"], default="default",
                   help="cpu: force the host backend (smoke runs). The "
                        "JAX_PLATFORMS env var is NOT honored in this "
                        "environment — sitecustomize re-pins it at interpreter "
                        "start, so only jax.config.update works")
    return p


def apply_platform(args):
    """Call first thing in every driver main(), before any jax computation."""
    if getattr(args, "platform", "default") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        mo = getattr(args, "model_parallel_outer", 0)
        mi = getattr(args, "model_parallel_inner", 0)
        model = mo * mi if (mo and mi) else getattr(args, "model_parallel", 1)
        n = getattr(args, "data_parallel", 1) * model
        if n > 1:
            # virtual CPU devices for mesh smoke runs; effective only if the
            # backend has not initialized yet (same trick as tests/conftest)
            import os

            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={n}"
                ).strip()


def sampling_rng(args):
    """encode()/serve() rng kwarg: a PRNG key when --temperature > 0."""
    if getattr(args, "temperature", 0.0) > 0:
        return jax.random.PRNGKey(args.seed)
    return None


def load_params_and_config(model: str, dtype=jnp.bfloat16):
    """Checkpoint path (.npz from convert_hf_checkpoint) or config name with
    synthetic weights (zero-egress default)."""
    from magicdec_tpu.config import ModelConfig
    from magicdec_tpu import quantization as Q

    if str(model).endswith(".npz"):
        from magicdec_tpu.utils.checkpoint import load_converted

        cfg = ModelConfig.from_name(str(model))
        params = load_converted(str(model), dtype=dtype)
        bits = Q.bits_from_path(str(model))
        if bits:
            params = Q.quantize_params(params, bits=bits)
        return params, cfg
    cfg = ModelConfig.from_name(model)
    from bench import make_params

    return make_params(cfg, dtype=dtype), cfg


def make_mesh_or_none(data: int, model: int, force: bool = False):
    if data * model <= 1 and not force:
        return None
    from magicdec_tpu.parallel.sharding import make_mesh

    return make_mesh(data=data, model=model)


def load_dataset(args, vocab_size: int) -> np.ndarray:
    from magicdec_tpu.data import datasets as D

    tok = None
    if args.model_name:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model_name)
        except Exception as e:
            print(f"[driver] tokenizer unavailable ({e}); synthetic corpus",
                  file=sys.stderr)
    if tok is None:
        return D.synthetic_long_context_dataset(
            args.prefix_len, num_seqs=max(args.B * 2, 16),
            vocab_size=vocab_size, seed=args.seed)
    if args.dataset == "pg19":
        return D.convert_pg19_dataset(tok, args.prefix_len)
    if args.dataset == "c4":
        return D.convert_c4_dataset(tok, args.prefix_len)
    raise ValueError(args.dataset)


def eot_ids_for(args, cfg) -> tuple:
    # reference: eos + unk/<|eot_id|> (selfspec:78-83); synthetic data cannot
    # hit them meaningfully, so default to a never-matching id
    return (-1,)


def force(x):
    """Synchronize through the async device relay (block_until_ready is not
    sufficient over remote transports): tiny host readback."""
    arr = np.asarray(jax.tree.leaves(x)[0]).ravel()
    return arr[:1]


class Timer:
    def __init__(self):
        self.t = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.t += time.perf_counter() - self.t0


def print_output(args, stats, max_rows: int = 4):
    """--printoutput: decoded text (or raw ids without a tokenizer) of the
    generated continuations — the reference's manual-inspection path
    (tests/baseline_benchmark.py:94-96)."""
    if not getattr(args, "printoutput", False):
        return
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"]).reshape(-1)
    tok = None
    if getattr(args, "model_name", None):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model_name)
        except Exception:
            pass
    for b in range(min(out.shape[0], max_rows)):
        ids = out[b, : int(n[b])].tolist()
        text = tok.decode(ids) if tok is not None else str(ids)
        print(f"[output {b}] {text}", file=sys.stderr)
