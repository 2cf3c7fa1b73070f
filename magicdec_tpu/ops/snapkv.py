"""SnapKV draft-cache construction (observation-window top-k compression).

Behavioral port of reference ``Attention.gen_draft_kv``
(Engine/SnapKV/model.py:389-439): score all prefix keys by the attention mass
the last `window` (already-roped) queries put on them, avg-pool the scores,
sum across each GQA group, keep the top-(budget - window) keys per kv head plus
the window itself.  Selected K/V keep their original rope — the draft cache is
position-incoherent across heads, which is fine because draft decode only ever
attends over it (SURVEY.md §2.2).

Deviations from the reference, both deliberate:
- the causal mask inside the observation window is applied to *all* GQA groups
  (the reference's chunked masking only lands exactly when chunk == window);
- no attention scaling either way (the reference omits 1/sqrt(d) here; we
  faithfully omit it too, since it changes the softmax temperature and thus
  the selected set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _avg_pool_1d(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """torch.nn.functional.avg_pool1d(k, stride=1, padding=k//2,
    count_include_pad=True) over the last axis."""
    pad = kernel // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    cs = jnp.cumsum(xp, axis=-1)
    cs = jnp.pad(cs, [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    return (cs[..., kernel:] - cs[..., :-kernel]) / kernel


def snapkv_compress(q_win: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                    *, ctx_len: int, window: int, budget: int,
                    kernel_size: int = 5, pooling: str = "avgpool",
                    k_scale=None, v_scale=None):
    """Select the compressed draft KV set.

    q_win:   [B, W, Hq, hd] roped queries of the last `window` prefill tokens
             (global positions ctx_len-W .. ctx_len-1).
    k_cache/v_cache: [B, S, Hkv*hd] with the first ctx_len slots filled
             (folded-head layout, ops.kv_cache) — OR the QUANTIZED cache
             (int8, or int4 head-pair-packed) when ``k_scale``/``v_scale``
             [B, Hkv, S] are given: the dequant then happens per request
             inside the batch scan, so the dense-cache transient is one
             request's [ctx, Hkv, hd] (~70 MB at 32k) instead of the whole
             batch's (2+ GiB at 32k/B=32 — the round-5 OOM that blocked the
             32k snapkv rows).  Values are bit-identical either way (dequant
             commutes with the per-request slice).
    Returns (dk_new, dv_new): [B, budget, Hkv, hd] (head-minor, ready to fold
    back into a draft cache).
    """
    from magicdec_tpu.ops import kv_cache as kv_ops

    B, W, Hq, hd = q_win.shape
    quant = k_scale is not None
    Hkv = k_scale.shape[1] if quant else k_cache.shape[2] // hd
    G = Hq // Hkv
    topk = budget - window
    assert W == window, (W, window)
    assert ctx_len - window >= topk, "prefix too short for draft budget"

    if quant:
        keys = k_cache[:, :ctx_len]            # quantized [B, ctx, lanes]
        vals = v_cache[:, :ctx_len]
        kss = k_scale[:, :, :ctx_len]          # [B, Hkv, ctx]
        vss = v_scale[:, :, :ctx_len]
    else:
        keys = k_cache[:, :ctx_len].reshape(B, ctx_len, Hkv, hd)
        vals = v_cache[:, :ctx_len].reshape(B, ctx_len, Hkv, hd)

    # causal mask for the window block: query i (global ctx-W+i) must not see
    # key j >= ctx-W+i+1
    col = jax.lax.broadcasted_iota(jnp.int32, (W, ctx_len), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (W, ctx_len), 0)
    visible = col <= (ctx_len - W) + row  # [W, ctx]

    def one_request(qb, kb, vb, ksb=None, vsb=None):
        # qb [W, Hq, hd]; kb/vb [ctx, Hkv, hd] (dense) or quantized + scales
        if ksb is not None:
            kb = kv_ops.dequant_kv(kb[None], ksb[None], hd,
                                   q_win.dtype)[0].reshape(ctx_len, Hkv, hd)
            vb = kv_ops.dequant_kv(vb[None], vsb[None], hd,
                                   q_win.dtype)[0].reshape(ctx_len, Hkv, hd)
        qg = qb.reshape(W, Hkv, G, hd).transpose(1, 2, 0, 3)  # [Hkv, G, W, hd]
        scores = jnp.einsum("kgwd,skd->kgws", qg.astype(jnp.float32),
                            kb.astype(jnp.float32))
        scores = jnp.where(visible[None, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        mass = probs[..., : ctx_len - W].sum(axis=2)        # [Hkv, G, ctx-W]
        pooled = _pool(mass)
        head_score = pooled.sum(axis=1)                     # [Hkv, ctx-W]
        _, idx = jax.lax.top_k(head_score, topk)            # [Hkv, topk]
        k_sel = jnp.take_along_axis(kb[: ctx_len - W], idx.T[..., None], axis=0)
        v_sel = jnp.take_along_axis(vb[: ctx_len - W], idx.T[..., None], axis=0)
        dk = jnp.concatenate([k_sel, kb[ctx_len - W: ctx_len]], axis=0)
        dv = jnp.concatenate([v_sel, vb[ctx_len - W: ctx_len]], axis=0)
        return dk, dv

    def _pool(mass):
        if pooling == "avgpool":
            return _avg_pool_1d(mass, kernel_size)
        if pooling == "maxpool":
            pad = kernel_size // 2
            mp = jnp.pad(mass, [(0, 0)] * (mass.ndim - 1) + [(pad, pad)],
                         constant_values=-jnp.inf)
            windows = jnp.stack([mp[..., i:i + mass.shape[-1]]
                                 for i in range(kernel_size)], axis=0)
            return windows.max(axis=0)
        raise ValueError(pooling)

    # scan over batch to bound the [G, W, ctx] fp32 score tensor's footprint
    # — and, on the quantized path, the per-request dense-cache dequant
    # (the reference chunks query rows for the same reason, model.py:406-418)
    xs = (q_win, keys, vals, kss, vss) if quant else (q_win, keys, vals)
    _, (dk_new, dv_new) = jax.lax.scan(
        lambda _, xs: (None, one_request(*xs)), None, xs)
    return dk_new, dv_new
