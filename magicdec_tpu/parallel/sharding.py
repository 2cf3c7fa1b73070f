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

GQA note: a non-divisible n_kv_head is padded to the mesh by the engines
(``pad_heads_for_tp`` — zero heads contributing exactly +0.0, SURVEY.md §7)
rather than the reference's uneven-head round-robin split (tp.py:36-52);
``validate_mesh`` itself stays strict (it runs after padding).
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


def make_submesh_mesh(data: int, model_outer: int, model_inner: int,
                      devices=None) -> Mesh:
    """3-axis mesh for the reference's draft-sub-mesh mode
    (tests/SnapKV/longspec_benchmark.py --rank_group 0-7 --draft_rank_group
    0-3, SURVEY.md §2.3 mode 4): the target is tensor-parallel over
    ("mo", "mi") = model_outer*model_inner devices; the standalone draft is
    tensor-parallel over "mi" only (replicated across "mo"), so its per-layer
    collectives span model_inner devices instead of the full TP group."""
    devices = devices if devices is not None else jax.devices()
    n = data * model_outer * model_inner
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, model_outer, model_inner)
    return Mesh(dev, axis_names=("data", "mo", "mi"))


def model_axes_of(mesh: Mesh):
    """The mesh axes acting as 'model' for the target."""
    if "model" in mesh.axis_names:
        return ("model",)
    return ("mo", "mi")


def draft_axes_of(mesh: Mesh):
    """The mesh axes acting as 'model' for the (standalone) draft."""
    if "model" in mesh.axis_names:
        return ("model",)
    return ("mi",)


def param_pspecs(cfg: ModelConfig, axes=("model",)) -> Any:
    """PartitionSpec pytree matching the params structure.  ``axes`` is the
    (possibly compound) mesh axis tuple used for tensor parallelism."""
    m = axes if len(axes) > 1 else axes[0]
    layers = {
        "wq": P(None, None, m),
        "wk": P(None, None, m),
        "wv": P(None, None, m),
        "bq": P(None, m) if cfg.qkv_bias else None,
        "bk": P(None, m) if cfg.qkv_bias else None,
        "bv": P(None, m) if cfg.qkv_bias else None,
        "wo": P(None, m, None),
        "w1": P(None, None, m),
        "w3": P(None, None, m),
        "w2": P(None, m, None),
        "attn_norm": P(None, None),
        "ffn_norm": P(None, None),
    }
    return {
        "embed": P(None, None),
        "layers": layers,
        "final_norm": P(None),
        "lm_head": P(None, m),  # vocab-sharded (reference tp.py:196)
    }


def cache_pspec(axes=("model",)) -> P:
    """KV caches [L, B, S, Hkv*hd]: batch on data, folded head axis on the
    model axes (head-major, so each model shard owns whole kv heads)."""
    m = axes if len(axes) > 1 else axes[0]
    return P(None, "data", None, m)


def scale_pspec(axes=("model",)) -> P:
    """int8-cache scale arrays [L, B, H_kv, S]: batch on data, kv-head axis on
    the model axes (each shard owns the scales of its own heads)."""
    m = axes if len(axes) > 1 else axes[0]
    return P(None, "data", m, None)


def pool_pspec(axes=("model",)) -> P:
    """Paged-serving KV pools [L, P, page_size, Hkv*hd]: each model shard
    owns whole kv heads of its pages; the PAGE axis shards over data — each
    data group owns the pages of its own slots (page-table entries are
    GROUP-LOCAL ids, engine/serving.PagedServingEngine), so appends never
    touch another group's pages and nothing diverges.  data=1 reproduces the
    reference's sole operating mode (8-way TP, Engine/tp.py:202-207)."""
    m = axes if len(axes) > 1 else axes[0]
    return P(None, "data", None, m)


def pool_scale_pspec(axes=("model",)) -> P:
    """Quantized-pool scale pools [L, P, Hkv, page_size] (page axis on data
    like pool_pspec)."""
    m = axes if len(axes) > 1 else axes[0]
    return P(None, "data", m, None)


def spec_state_pspecs(axes=("model",), draft_axes=None,
                      kv_quant: bool = False, sampled: bool = False,
                      paged: bool = False) -> Any:
    """PartitionSpecs for engine.state.SpecState fields.  draft caches may be
    sharded over a sub-axis of the target's model axes (draft sub-mesh).
    ``sampled``: state carries the coupled-Gumbel rng (replicated) and the
    per-request salt (data-sharded).  ``paged``: k/v (+ks/vs) are page POOLS
    and the state carries the page ``table`` (engine/serving.
    PagedServingEngine)."""
    from magicdec_tpu.engine.state import SpecState

    b = P("data")
    if paged:
        return SpecState(
            k=pool_pspec(axes), v=pool_pspec(axes), target_lens=b,
            table=P("data", None),
            dk=cache_pspec(draft_axes or axes),
            dv=cache_pspec(draft_axes or axes),
            draft_fill=b, draft_pos=b,
            token0=b, output=P("data", None),
            num_committed=b, target_steps=P(), done=P(),
            db_tokens=P("data", None), db_update=b,
            ks=pool_scale_pspec(axes) if kv_quant else None,
            vs=pool_scale_pspec(axes) if kv_quant else None,
            rng=P() if sampled else None,
            salt=b if sampled else None,
        )
    return SpecState(
        k=cache_pspec(axes), v=cache_pspec(axes), target_lens=b,
        dk=cache_pspec(draft_axes or axes), dv=cache_pspec(draft_axes or axes),
        draft_fill=b, draft_pos=b,
        token0=b, output=P("data", None),
        num_committed=b, target_steps=P(), done=P(),
        db_tokens=P("data", None), db_update=b,
        ks=scale_pspec(axes) if kv_quant else None,
        vs=scale_pspec(axes) if kv_quant else None,
        rng=P() if sampled else None,
        salt=b if sampled else None,
    )


def baseline_state_pspecs(axes=("model",), kv_quant: bool = False,
                          sampled: bool = False) -> Any:
    from magicdec_tpu.engine.state import BaselineState

    b = P("data")
    return BaselineState(k=cache_pspec(axes), v=cache_pspec(axes), lens=b,
                         token0=b, output=P("data", None), num_committed=b,
                         ks=scale_pspec(axes) if kv_quant else None,
                         vs=scale_pspec(axes) if kv_quant else None,
                         rng=P() if sampled else None,
                         salt=b if sampled else None)


def quant_param_pspecs(cfg: ModelConfig, params, axes=("model",)) -> Any:
    """PartitionSpec pytree for a quantize_params() output: each
    QuantizedWeight leaf gets (q, scale) specs derived from the dense spec —
    column-sharded weights shard q and the per-output scale on the output
    axis; row-sharded weights shard q's contraction axis, and the scale's
    group axis shards with it when groups tile per-shard (else replicate)."""
    from magicdec_tpu.quantization import QuantizedWeight, is_quantized

    m = axes if len(axes) > 1 else axes[0]
    dense = param_pspecs(cfg, axes)

    def spec_for(w, dense_spec):
        if not is_quantized(w):
            return dense_spec
        in_axis = w.q.ndim - 2  # [..., In(or In//2 packed), Out]
        sharded_axes = tuple(a for a, s in enumerate(dense_spec) if s is not None)
        if dense_spec[-1] is not None:  # column-sharded: Out sharded
            q_spec = dense_spec
            scale_spec = P(*([None] * (w.scale.ndim - 1)), m)
        elif in_axis in sharded_axes:   # row-sharded: In sharded
            q_spec = dense_spec
            G = w.scale.shape[-2]
            scale_spec = (P(*([None] * (w.scale.ndim - 2)), m, None)
                          if G > 1 else P(*([None] * w.scale.ndim)))
        else:
            q_spec = dense_spec
            scale_spec = P(*([None] * w.scale.ndim))
        return QuantizedWeight(q=q_spec, scale=scale_spec, bits=w.bits,
                               group_size=w.group_size)

    layers = {k: spec_for(params["layers"][k], dense["layers"].get(k))
              for k in params["layers"]}
    out = dict(dense, layers=layers)
    if params.get("lm_head") is not None:
        out["lm_head"] = spec_for(params["lm_head"], dense["lm_head"])
    return out


def shard_quant_params(qparams, cfg: ModelConfig, mesh: Mesh, axes=None):
    """device_put a quantize_params() pytree with TP shardings."""
    from magicdec_tpu.quantization import QuantizedWeight

    axes = axes or model_axes_of(mesh)
    pspecs = quant_param_pspecs(cfg, qparams, axes)

    def put(x, s):
        if x is None:
            return None
        if isinstance(x, QuantizedWeight):
            return QuantizedWeight(
                q=jax.device_put(x.q, NamedSharding(mesh, s.q)),
                scale=jax.device_put(x.scale, NamedSharding(mesh, s.scale)),
                bits=x.bits, group_size=x.group_size)
        return jax.device_put(x, NamedSharding(mesh, s))

    is_leaf = lambda x: x is None or isinstance(x, QuantizedWeight)
    return jax.tree.map(put, qparams, pspecs, is_leaf=is_leaf)


def _to_shardings(tree_pspecs, mesh: Mesh):
    return jax.tree.map(
        lambda ps: None if ps is None else NamedSharding(mesh, ps),
        tree_pspecs,
        is_leaf=lambda x: isinstance(x, P) or x is None)


def shard_params(params, cfg: ModelConfig, mesh: Mesh, axes=None):
    """device_put the params pytree with TP shardings."""
    axes = axes or model_axes_of(mesh)
    shardings = _to_shardings(param_pspecs(cfg, axes), mesh)

    def put(x, s):
        return x if x is None else jax.device_put(x, s)

    return jax.tree.map(put, params, shardings,
                        is_leaf=lambda x: x is None)


def pad_heads_for_tp(params, cfg: ModelConfig, mesh: Mesh, axes=None):
    """Pad kv heads (and their q-head groups) to model-axis divisibility.

    The reference handles a non-divisible kv-head count by round-robining
    uneven head sets across ranks (Engine/tp.py:36-52 _select_kv_heads); a
    GSPMD mesh wants EQUAL shards, so this implements the SURVEY.md §7
    alternative instead: append zero kv heads (k = v = 0 -> their attention
    output is exactly 0: uniform softmax over zero logits times zero values)
    and the matching zero q-head groups / zero wo rows, so padded heads
    contribute exactly +0.0 to every real output row — single-device outputs
    are reproduced bit-for-bit (tests/test_sharding.py).  GQA q-head groups
    stay contiguous per kv head (ops.attention reshapes q to
    [B, T, Hkv, G, hd]), so end-padding preserves the real heads' grouping.

    Returns (params, cfg) unchanged when already divisible.  Cost: the KV
    cache allocates the padded head count — e.g. 2 kv heads on a 4-way model
    axis doubles cache bytes; prefer a divisible mesh when you can.

    Quantized leaves: dense + int8 per-output-channel (G == 1) only — int4
    packing and group-wise scales do not pad along the contraction cleanly;
    quantize AFTER padding instead (engines pad before quantize_params).
    """
    import dataclasses

    import jax.numpy as jnp

    from magicdec_tpu.quantization import QuantizedWeight, is_quantized

    axes = axes or model_axes_of(mesh)
    model = 1
    for a in axes:
        model *= mesh.shape[a]
    if cfg.n_kv_head % model == 0:
        return params, cfg
    hkv2 = -(-cfg.n_kv_head // model) * model
    g = cfg.gqa_groups
    hq2 = hkv2 * g
    hd = cfg.head_dim

    def pad_axis(w, axis, new):
        if w is None:
            return None
        if is_quantized(w):
            if w.bits != 8 or w.scale.shape[-2] != 1:
                raise NotImplementedError(
                    "pad_heads_for_tp supports dense and int8 per-channel "
                    "weights; quantize after padding for int4/group-wise")
            ndim = w.q.ndim
            ax = axis if axis >= 0 else ndim + axis
            qpad = [(0, 0)] * ndim
            qpad[ax] = (0, new - w.q.shape[ax])
            spad = [(0, 0)] * w.scale.ndim
            if ax == ndim - 1:  # output axis: scale columns pad too
                spad[-1] = (0, new - w.scale.shape[-1])
            return QuantizedWeight(q=jnp.pad(w.q, qpad),
                                   scale=jnp.pad(w.scale, spad),
                                   bits=w.bits, group_size=w.group_size)
        ndim = w.ndim
        ax = axis if axis >= 0 else ndim + axis
        pad = [(0, 0)] * ndim
        pad[ax] = (0, new - w.shape[ax])
        return jnp.pad(w, pad)

    L = dict(params["layers"])
    assert L.get("wqkv") is None and L.get("w13") is None, \
        "pad before fuse_exec_params (mesh engines never fuse)"
    L["wq"] = pad_axis(L["wq"], -1, hq2 * hd)
    L["wk"] = pad_axis(L["wk"], -1, hkv2 * hd)
    L["wv"] = pad_axis(L["wv"], -1, hkv2 * hd)
    L["wo"] = pad_axis(L["wo"], -2, hq2 * hd)
    for b, n in (("bq", hq2), ("bk", hkv2), ("bv", hkv2)):
        if L.get(b) is not None:
            L[b] = pad_axis(L[b], -1, n * hd)
    new_cfg = dataclasses.replace(cfg, n_head=hq2, n_kv_head=hkv2)
    # __post_init__ recomputes head_dim = dim // n_head, which is wrong for a
    # padded head count (dim is an architecture fact, padding is not)
    object.__setattr__(new_cfg, "head_dim", hd)
    return dict(params, layers=L), new_cfg


def validate_mesh(cfg: ModelConfig, mesh: Mesh, axes=None) -> None:
    axes = axes or model_axes_of(mesh)
    model = 1
    for a in axes:
        model *= mesh.shape[a]
    if cfg.n_kv_head % model != 0:
        raise ValueError(
            f"n_kv_head={cfg.n_kv_head} not divisible by model axis {model}; "
            "engines pad automatically (pad_heads_for_tp) — direct callers "
            "should pad first")
    if cfg.vocab_size % model != 0:
        raise ValueError("vocab not divisible by model axis")
