"""GSPMD mesh sharding for the engine (TPU-native tensor parallelism).

Replaces the reference's Engine/tp.py (NCCL process groups + in-place weight
slicing + manual all-reduces, tp.py:36-207) with a single-controller
``jax.sharding.Mesh`` and PartitionSpecs.  XLA inserts the psum after the
row-sharded wo/w2 matmuls and runs the vocab-sharded argmax collectives —
the hand-written two-allreduce argmax trick (Engine/SnapKV/model.py:178-188)
falls out of ``jnp.argmax`` on a vocab-sharded logits array, with the same
lowest-index tie-breaking as one chip.

Axes:
  data  — batch-sharded: caches, token buffers, lengths.
  model — head-sharded attention (wq/wk/wv columns, wo rows, KV-cache head
          axis), column/row-sharded MLP, vocab-sharded lm_head.

GQA note: n_kv_head must be divisible by the model-axis size; pad kv heads to
the mesh (SURVEY.md §7) rather than the reference's uneven-head split
(tp.py:36-52).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from magicdec_tpu.config import ModelConfig


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def param_pspecs(cfg: ModelConfig) -> Any:
    """PartitionSpec pytree matching the params structure."""
    layers = {
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "bq": P(None, "model") if cfg.qkv_bias else None,
        "bk": P(None, "model") if cfg.qkv_bias else None,
        "bv": P(None, "model") if cfg.qkv_bias else None,
        "wo": P(None, "model", None),
        "w1": P(None, None, "model"),
        "w3": P(None, None, "model"),
        "w2": P(None, "model", None),
        "attn_norm": P(None, None),
        "ffn_norm": P(None, None),
    }
    return {
        "embed": P(None, None),
        "layers": layers,
        "final_norm": P(None),
        "lm_head": P(None, "model"),  # vocab-sharded (reference tp.py:196)
    }


def cache_pspec() -> P:
    """KV caches [L, B, S, Hkv*hd]: batch on data, folded head axis on model
    (head-major, so each model shard owns whole kv heads)."""
    return P(None, "data", None, "model")


def spec_state_pspecs() -> Any:
    """PartitionSpecs for engine.state.SpecState fields."""
    from magicdec_tpu.engine.state import SpecState

    b = P("data")
    return SpecState(
        k=cache_pspec(), v=cache_pspec(), target_lens=b,
        dk=cache_pspec(), dv=cache_pspec(),
        draft_fill=b, draft_pos=b,
        token0=b, output=P("data", None),
        num_committed=b, target_steps=P(), done=P(),
        db_tokens=P("data", None), db_update=b,
    )


def baseline_state_pspecs() -> Any:
    from magicdec_tpu.engine.state import BaselineState

    b = P("data")
    return BaselineState(k=cache_pspec(), v=cache_pspec(), lens=b, token0=b,
                         output=P("data", None), num_committed=b)


def _to_shardings(tree_pspecs, mesh: Mesh):
    return jax.tree.map(
        lambda ps: None if ps is None else NamedSharding(mesh, ps),
        tree_pspecs,
        is_leaf=lambda x: isinstance(x, P) or x is None)


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """device_put the params pytree with TP shardings."""
    shardings = _to_shardings(param_pspecs(cfg), mesh)

    def put(x, s):
        return x if x is None else jax.device_put(x, s)

    return jax.tree.map(put, params, shardings,
                        is_leaf=lambda x: x is None)


def validate_mesh(cfg: ModelConfig, mesh: Mesh) -> None:
    model = mesh.shape["model"]
    if cfg.n_kv_head % model != 0:
        raise ValueError(
            f"n_kv_head={cfg.n_kv_head} not divisible by model axis {model}; "
            "pad kv heads to the mesh (SURVEY.md §7)")
    if cfg.vocab_size % model != 0:
        raise ValueError("vocab not divisible by model axis")
