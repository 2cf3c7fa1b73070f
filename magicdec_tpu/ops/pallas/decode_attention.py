"""Pallas TPU flash-decode attention over the contiguous length-governed cache.

This is the TPU-native replacement for flashinfer's
``BatchPrefillWithPagedKVCacheWrapper`` decode/verify path (reference
Engine/SnapKV/backend.py:56-107): a small query window (T = 1 decode,
gamma+1 verify) attends over a long per-request KV prefix with causal
end-alignment, GQA, online (flash) softmax — without materialising the
[B, H, T, S] score tensor the jnp oracle (ops/attention.attend) creates.

Layout: caches are [B, S, H_kv*hd] (folded head axis, ops/kv_cache.py) or the
layer-stacked [L, B, S, H_kv*hd] with a **prefetched layer index** — the
layer-scan passes the full stacked cache and the kernel's BlockSpec index maps
select layer ``l`` directly, so no [B, S, K] layer slice is ever materialised.
(A layer slice is a full HBM copy when it feeds a custom call: measured ~4
full-cache passes per forward step, dominating decode at long context.)
Queries are packed as [GT rows, H_kv*hd lanes], lanes h*hd:(h+1)*hd = head h.

Design:
- grid (B, S/block_s) iterated sequentially per TPU core; running max /
  normaliser / accumulator live in VMEM scratch across the S-block dimension;
  the per-head loop is unrolled inside the kernel.
- per-request lengths are scalar-prefetched; the K/V BlockSpec index maps
  clamp the block index to the last visible block, so blocks past a request's
  length are neither fetched (the pipeline dedups repeated indices) nor
  computed — the moral equivalent of flashinfer's ragged page tables, without
  host-side plan() calls.
- block_s should be as large as VMEM allows (ops/attention._pick_block_s):
  the per-head dots are tiny, so small blocks leave the kernel
  MXU-latency-bound instead of HBM-bandwidth-bound.
- q rows are the G*T (group-major) flattened query window; causal masking is
  col < base_len + (row % T) + 1, identical to the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _stack(cache, layer):
    """Normalize cache to [L, B, S, K] + [1] int32 layer index."""
    if cache.ndim == 3:
        return cache[None], jnp.zeros((1,), jnp.int32)
    return cache, jnp.asarray(layer, jnp.int32).reshape(1)


def _pack_q(q, Hkv, K):
    """[B, T, Hq, hd] -> [B, GT, K] rows group-major, lanes head-major."""
    B, T, Hq, hd = q.shape
    G = Hq // Hkv
    GT = G * T
    return (q.reshape(B, T, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
            .reshape(B, Hkv, GT, hd).transpose(0, 2, 1, 3).reshape(B, GT, K))


def _unpack_o(out, Hkv, G, T, hd):
    B, GT, K = out.shape
    return (out.reshape(B, GT, Hkv, hd).transpose(0, 2, 1, 3)
            .reshape(B, Hkv, G, T, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, T, Hkv * G, hd))


def _online_update(h, s, v, m_scr, l_scr, acc_scr):
    """One online-softmax block update for head h (s fp32 [GT, N], v [N, hd])."""
    m_prev = m_scr[h]                             # [GT, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                        # [GT, N] fp32
    corr = jnp.exp(m_prev - m_new)                # [GT, 1]
    l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[h] = m_new
    return p


def _decode_kernel(layer_ref, lens_ref, q_ref, k_ref, v_ref, *rest,
                   T: int, block_s: int, scale: float,
                   n_kv: int, hd: int, fresh: bool):
    """``fresh=False``: the cache already contains the T window tokens and
    rows see cols < base + row_t + 1.  ``fresh=True``: the window tokens ride
    as separate [1, T, K] operands (kn_ref/vn_ref) processed as one extra
    online-softmax block at j == 0, and the cache is visible to col < base
    only — this lets the caller append AFTER attention so the cache buffer
    has a single-ownership chain (no copy; see ops/attention.attend_cache)."""
    if fresh:
        kn_ref, vn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    nblocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = lens_ref[b]  # visible prefix length (before the T new tokens)
    start = j * block_s
    GT = q_ref.shape[1]

    if fresh:
        @pl.when(j == 0)
        def _fresh():
            Tp = kn_ref.shape[1]  # fresh rows padded to >= 8 sublanes
            colT = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 1)
            row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 0) % T
            vis = (colT <= row_t) & (colT < T)
            for h in range(n_kv):
                q = q_ref[0, :, h * hd:(h + 1) * hd]
                kn = kn_ref[0, :, h * hd:(h + 1) * hd]       # [Tp, hd]
                vn = vn_ref[0, :, h * hd:(h + 1) * hd]
                s = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                s = jnp.where(vis, s, NEG_INF)
                _online_update(h, s, vn, m_scr, l_scr, acc_scr)

    @pl.when(start < (base if fresh else base + T))
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 0) % T
        visible = col < (base if fresh else base + row_t + 1)
        for h in range(n_kv):
            # bf16 into the MXU, fp32 accumulate
            q = q_ref[0, :, h * hd:(h + 1) * hd]             # [GT, hd]
            k = k_ref[0, 0, :, h * hd:(h + 1) * hd]          # [BS, hd]
            v = v_ref[0, 0, :, h * hd:(h + 1) * hd]          # [BS, hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(visible, s, NEG_INF)
            _online_update(h, s, v, m_scr, l_scr, acc_scr)

    @pl.when(j == nblocks - 1)
    def _finish():
        # per-head lane-slice writes (Mosaic rejects the transposed reshape)
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _quant_online_update(h, s_raw, visible, ksc, vsc, v, scale,
                         m_scr, l_scr, acc_scr):
    """Quantized online-softmax block: k scale on score columns, v scale on p.
    Scale rows may stream as bf16 (kv_scale_dtype) — arithmetic stays f32."""
    ksc = ksc.astype(jnp.float32)
    vsc = vsc.astype(jnp.float32)
    s = s_raw * (ksc * scale)[None, :]
    s = jnp.where(visible, s, NEG_INF)
    m_prev = m_scr[h]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
        (p * vsc[None, :]).astype(v.dtype), v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[h] = m_new


def _decode_quant_kernel(layer_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref,
                         vs_ref, *rest, T: int,
                         block_s: int, scale: float, n_kv: int, hd: int,
                         fresh: bool):
    """int8-KV flash decode: KV blocks stream as int8 (half the HBM bytes of
    bf16 — the decode bottleneck at long context); per-(token, head) scales
    stream as [1, 1, n_kv, block_s] f32 lane rows.  The k scale multiplies the
    score row after the q.k dot; the v scale multiplies p before the p.v dot —
    both lane-wise broadcasts, so no in-kernel transposes (Mosaic-safe).
    int8 -> bf16 casts are exact (|q| <= 127).  ``fresh``: see _decode_kernel —
    the T window tokens ride as int8 [1, T, K] + scale [1, n_kv, T] operands
    (the SAME quantized values the caller appends afterwards, so numerics are
    identical to attending over the appended cache)."""
    if fresh:
        kn_ref, vn_ref, ksn_ref, vsn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    nblocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = lens_ref[b]
    start = j * block_s
    GT = q_ref.shape[1]

    if fresh:
        @pl.when(j == 0)
        def _fresh():
            Tp = kn_ref.shape[1]
            colT = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 1)
            row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 0) % T
            vis = (colT <= row_t) & (colT < T)
            for h in range(n_kv):
                q = q_ref[0, :, h * hd:(h + 1) * hd]
                kn = kn_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)
                vn = vn_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)
                s = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                _quant_online_update(h, s, vis, ksn_ref[0, h, :],
                                     vsn_ref[0, h, :], vn, scale,
                                     m_scr, l_scr, acc_scr)

    @pl.when(start < (base if fresh else base + T))
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 0) % T
        visible = col < (base if fresh else base + row_t + 1)
        for h in range(n_kv):
            q = q_ref[0, :, h * hd:(h + 1) * hd]                     # [GT, hd]
            k = k_ref[0, 0, :, h * hd:(h + 1) * hd].astype(q.dtype)  # [BS, hd]
            v = v_ref[0, 0, :, h * hd:(h + 1) * hd].astype(q.dtype)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            _quant_online_update(h, s, visible, ks_ref[0, 0, h, :],
                                 vs_ref[0, 0, h, :], v, scale,
                                 m_scr, l_scr, acc_scr)

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _unpack_int4_planes(raw, dtype):
    """Packed int8 [R, Kp] -> (low, high) nibble planes [R, Kp] in `dtype`.

    Plane layout follows ops.kv_cache.pack_int4_heads: packed pseudo-head i
    lane l holds (head 2i, l) in the low nibble and (head 2i+1, l) in the
    high nibble.  Shifts run in int32 (the only width Mosaic legalizes
    shifts at); int32 -> bf16 casts are exact for values in [-8, 7].
    """
    r = raw.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(r, 28), 28)
    hi = jnp.right_shift(r, 4)
    return lo.astype(dtype), hi.astype(dtype)


def _decode_quant4_kernel(layer_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref,
                          vs_ref, *rest, T: int,
                          block_s: int, scale: float, n_kv: int, hd: int,
                          fresh: bool):
    """int4-KV flash decode: KV blocks stream as head-pair-packed int8
    (ops.kv_cache.pack_int4_heads — a QUARTER of bf16's HBM bytes), unpacked
    to nibble planes once per block; head h reads lanes (h//2)*hd of the
    (h%2 ? high : low) plane.  Scales/masking/online softmax are identical to
    the int8 kernel; ``fresh`` window tokens ride packed too."""
    if fresh:
        kn_ref, vn_ref, ksn_ref, vsn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    nblocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = lens_ref[b]
    start = j * block_s
    GT = q_ref.shape[1]
    qdt = q_ref.dtype

    if fresh:
        @pl.when(j == 0)
        def _fresh():
            Tp = kn_ref.shape[1]
            colT = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 1)
            row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 0) % T
            vis = (colT <= row_t) & (colT < T)
            knlo, knhi = _unpack_int4_planes(kn_ref[0], qdt)  # [Tp, Kp]
            vnlo, vnhi = _unpack_int4_planes(vn_ref[0], qdt)
            for h in range(n_kv):
                off = (h // 2) * hd
                kn = (knhi if h % 2 else knlo)[:, off:off + hd]
                vn = (vnhi if h % 2 else vnlo)[:, off:off + hd]
                q = q_ref[0, :, h * hd:(h + 1) * hd]
                s = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                _quant_online_update(h, s, vis, ksn_ref[0, h, :],
                                     vsn_ref[0, h, :], vn, scale,
                                     m_scr, l_scr, acc_scr)

    @pl.when(start < (base if fresh else base + T))
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 0) % T
        visible = col < (base if fresh else base + row_t + 1)
        klo, khi = _unpack_int4_planes(k_ref[0, 0], qdt)     # [BS, Kp] each
        vlo, vhi = _unpack_int4_planes(v_ref[0, 0], qdt)
        for h in range(n_kv):
            off = (h // 2) * hd
            k = (khi if h % 2 else klo)[:, off:off + hd]     # [BS, hd]
            v = (vhi if h % 2 else vlo)[:, off:off + hd]
            q = q_ref[0, :, h * hd:(h + 1) * hd]             # [GT, hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            _quant_online_update(h, s, visible, ks_ref[0, 0, h, :],
                                 vs_ref[0, 0, h, :], v, scale,
                                 m_scr, l_scr, acc_scr)

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _decode_call(kernel, q, k4, v4, layer_arr, base_lens, *, Kq, block_s,
                 scratch_hd, n_kv, T, interpret, extras=(), fresh_ops=()):
    """Shared pallas_call plumbing for the decode kernels.

    k4/v4: [L, B, S, Kc] (Kc = dense or nibble-packed lane width); extras =
    (k_scale4, v_scale4) as [L, B, Hkv, S] when quantized.  q packed
    [B, GT, Kq].  fresh_ops = (k_new, v_new[, ks_new, vs_new]): the T window
    tokens as [B, T, Kc] (+ scales [B, Hkv, T]) when the cache does NOT yet
    contain them (fresh=True kernels)."""
    B, GT, _ = q.shape
    S = k4.shape[2]
    nblocks = S // block_s
    lens = base_lens.astype(jnp.int32)
    Kc = k4.shape[3]

    def q_map(b, j, layer_ref, lens_ref):
        return (b, 0, 0)

    T_clamp = 0 if fresh_ops else T

    def kv_map(b, j, layer_ref, lens_ref):
        last = jnp.maximum(lens_ref[b] + T_clamp - 1, 0) // block_s
        return (layer_ref[0], b, jnp.minimum(j, last), 0)

    def scale_map(b, j, layer_ref, lens_ref):
        last = jnp.maximum(lens_ref[b] + T_clamp - 1, 0) // block_s
        return (layer_ref[0], b, 0, jnp.minimum(j, last))

    in_specs = [
        pl.BlockSpec((1, GT, Kq), q_map),
        pl.BlockSpec((1, 1, block_s, Kc), kv_map),
        pl.BlockSpec((1, 1, block_s, Kc), kv_map),
    ]
    if extras:
        Hkv = extras[0].shape[2]
        in_specs += [pl.BlockSpec((1, 1, Hkv, block_s), scale_map)] * 2
    if fresh_ops:
        Tp = max(T, 8)
        if Tp != T:
            pad_rows = lambda x: jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
            pad_scales = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T)))
            fresh_ops = (pad_rows(fresh_ops[0]), pad_rows(fresh_ops[1]),
                         *(pad_scales(x) for x in fresh_ops[2:]))
        in_specs += [pl.BlockSpec((1, Tp, Kc), q_map)] * 2
        if len(fresh_ops) == 4:
            Hkv = fresh_ops[2].shape[1]
            in_specs += [pl.BlockSpec((1, Hkv, Tp), q_map)] * 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nblocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, GT, Kq), q_map),
        scratch_shapes=[
            pltpu.VMEM((n_kv, GT, 1), jnp.float32),
            pltpu.VMEM((n_kv, GT, 1), jnp.float32),
            pltpu.VMEM((n_kv, GT, scratch_hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, Kq), q.dtype),
        interpret=interpret,
    )(layer_arr, lens, q, k4, v4, *extras, *fresh_ops)


def _whole_row_kernel(layer_ref, lens_ref, q_ref, k_ref, v_ref, *rest,
                      T: int, bb: int, scale: float, n_kv: int, hd: int,
                      fresh: bool):
    """Whole-cache-row decode for ``bb`` requests per grid cell.

    Draft/budget caches fit one KV block (S <= ~640 rows), so the blocked
    kernel degenerates to grid (B, 1) — 32 sequential cells each doing a few
    microseconds of tiny per-head dots, leaving the call ~5x its bandwidth
    floor in per-cell fixed costs (measured 1.96 ms of a 4.4 ms draft step
    at B=32, scripts/profile_draft.py).  Packing bb requests per cell cuts
    the cell count bb-fold; softmax runs with LOCAL online accumulators (two
    sub-blocks: cache + fresh) so no cross-cell scratch is needed."""
    if fresh:
        kn_ref, vn_ref, o_ref = rest
    else:
        o_ref, = rest
    g = pl.program_id(0)
    GT = q_ref.shape[1]
    S = k_ref.shape[2]

    for i in range(bb):
        base = lens_ref[g * bb + i]
        col = jax.lax.broadcasted_iota(jnp.int32, (GT, S), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, S), 0) % T
        visible = col < (base if fresh else base + row_t + 1)
        if fresh:
            Tp = kn_ref.shape[1]
            colT = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 1)
            rowT = jax.lax.broadcasted_iota(jnp.int32, (GT, Tp), 0) % T
            visT = (colT <= rowT) & (colT < T)
        for h in range(n_kv):
            q = q_ref[i, :, h * hd:(h + 1) * hd]              # [GT, hd]
            k = k_ref[0, i, :, h * hd:(h + 1) * hd]           # [S, hd]
            v = v_ref[0, i, :, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(visible, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            if fresh:
                kn = kn_ref[i, :, h * hd:(h + 1) * hd]
                vn = vn_ref[i, :, h * hd:(h + 1) * hd]
                sn = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32) * scale
                sn = jnp.where(visT, sn, NEG_INF)
                m = jnp.maximum(m, jnp.max(sn, axis=-1, keepdims=True))
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            if fresh:
                pn = jnp.exp(sn - m)
                l = l + jnp.sum(pn, axis=-1, keepdims=True)
                acc = acc + jax.lax.dot_general(pn.astype(vn.dtype), vn,
                                                (((1,), (0,)), ((), ())),
                                                preferred_element_type=jnp.float32)
            o_ref[i, :, h * hd:(h + 1) * hd] = (
                acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _whole_row_call(q, k4, v4, layer_arr, base_lens, *, T, n_kv, hd,
                    interpret, fresh_ops=()):
    """Grid (B/bb,) whole-row dispatch (see _whole_row_kernel)."""
    B, GT, K = q.shape
    S = k4.shape[2]
    esz = jnp.dtype(k4.dtype).itemsize
    bb = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and cand * S * K * esz * 2 * 2 <= 8 * 1024 * 1024:
            bb = cand
            break
    lens = base_lens.astype(jnp.int32)
    fresh = bool(fresh_ops)
    if fresh:
        T_new = fresh_ops[0].shape[1]
        Tp = max(T_new, 8)
        if Tp != T_new:
            fresh_ops = tuple(jnp.pad(x, ((0, 0), (0, Tp - T_new), (0, 0)))
                              for x in fresh_ops)

    def q_map(g, layer_ref, lens_ref):
        return (g, 0, 0)

    def kv_map(g, layer_ref, lens_ref):
        return (layer_ref[0], g, 0, 0)

    in_specs = [
        pl.BlockSpec((bb, GT, K), q_map),
        pl.BlockSpec((1, bb, S, K), kv_map),
        pl.BlockSpec((1, bb, S, K), kv_map),
    ]
    if fresh:
        in_specs += [pl.BlockSpec((bb, fresh_ops[0].shape[1], K), q_map)] * 2
    kernel = functools.partial(_whole_row_kernel, T=T, bb=bb,
                               scale=1.0 / (hd ** 0.5), n_kv=n_kv, hd=hd,
                               fresh=fresh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, GT, K), q_map),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, K), q.dtype),
        interpret=interpret,
    )(layer_arr, lens, q, k4, v4, *fresh_ops)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attend(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                        base_lens: jnp.ndarray, *, layer=None,
                        k_new=None, v_new=None,
                        block_s: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.attention.attend(causal=True) on the decode path.

    q: [B, T, Hq, hd]; k_cache/v_cache: [B, S, Hkv*hd] or layer-stacked
    [L, B, S, Hkv*hd] with ``layer`` the index to attend (no layer slice is
    materialised); base_lens: [B] int32.  Requires S % block_s == 0.
    k_new/v_new [B, T, Hkv*hd]: the window tokens when they are NOT yet in
    the cache (the caller appends after attention — see _decode_kernel).
    """
    B, T, Hq, hd = q.shape
    k4, layer_arr = _stack(k_cache, layer)
    v4, _ = _stack(v_cache, layer)
    K = k4.shape[3]
    Hkv = K // hd
    G = Hq // Hkv
    S = k4.shape[2]
    assert S % block_s == 0, (k4.shape, block_s)
    fresh = k_new is not None
    fresh_ops = ((k_new.reshape(B, T, K).astype(q.dtype),
                  v_new.reshape(B, T, K).astype(q.dtype)) if fresh else ())

    qg = _pack_q(q, Hkv, K)
    if block_s == S and B % 2 == 0:
        # budget-sized caches: grid over request GROUPS, not (B, 1) cells
        out = _whole_row_call(qg, k4, v4, layer_arr, base_lens, T=T,
                              n_kv=Hkv, hd=hd, interpret=interpret,
                              fresh_ops=fresh_ops)
        return _unpack_o(out, Hkv, G, T, hd)
    kernel = functools.partial(_decode_kernel, T=T, block_s=block_s,
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd,
                               fresh=fresh)
    out = _decode_call(kernel, qg, k4, v4, layer_arr, base_lens, Kq=K,
                       block_s=block_s, scratch_hd=hd, n_kv=Hkv, T=T,
                       interpret=interpret, fresh_ops=fresh_ops)
    return _unpack_o(out, Hkv, G, T, hd)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attend_quant(q: jnp.ndarray, k_cache: jnp.ndarray,
                              k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                              v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                              layer=None, k_new=None, v_new=None,
                              ks_new=None, vs_new=None, block_s: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    """flash_decode_attend over int8 caches with per-(token, head) scales.

    q: [B, T, Hq, hd]; k_cache/v_cache: int8 [(L,) B, S, Hkv*hd];
    k_scale/v_scale: f32 [(L,) B, Hkv, S] (ops.kv_cache.quantize_kv_tokens
    layout); base_lens: [B] int32.  Requires S % block_s == 0.
    k_new/v_new int8 [B, T, Hkv*hd] + ks_new/vs_new f32 [B, Hkv, T]: window
    tokens not yet appended (same quantized values the caller will append).
    """
    B, T, Hq, hd = q.shape
    k4, layer_arr = _stack(k_cache, layer)
    v4, _ = _stack(v_cache, layer)
    ks4, _ = _stack(k_scale, layer)
    vs4, _ = _stack(v_scale, layer)
    K = k4.shape[3]
    Hkv = K // hd
    G = Hq // Hkv
    assert k4.shape[2] % block_s == 0, (k4.shape, block_s)
    fresh = k_new is not None
    fresh_ops = ((k_new, v_new, ks_new, vs_new) if fresh else ())

    qg = _pack_q(q, Hkv, K)
    kernel = functools.partial(_decode_quant_kernel, T=T, block_s=block_s,
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd,
                               fresh=fresh)
    out = _decode_call(kernel, qg, k4, v4, layer_arr, base_lens, Kq=K,
                       block_s=block_s, scratch_hd=hd, n_kv=Hkv, T=T,
                       interpret=interpret, extras=(ks4, vs4),
                       fresh_ops=fresh_ops)
    return _unpack_o(out, Hkv, G, T, hd)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attend_quant4(q: jnp.ndarray, k_cache: jnp.ndarray,
                               k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                               v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                               layer=None, k_new=None, v_new=None,
                               ks_new=None, vs_new=None, block_s: int = 512,
                               interpret: bool = False) -> jnp.ndarray:
    """flash_decode_attend over int4 head-pair-packed caches.

    q: [B, T, Hq, hd]; k_cache/v_cache: packed int8 [(L,) B, S, (Hkv//2)*hd]
    (ops.kv_cache.quantize_kv_tokens_int4 layout); k_scale/v_scale: f32
    [(L,) B, Hkv, S]; base_lens: [B] int32.  Requires S % block_s == 0.
    k_new/v_new packed int8 [B, T, (Hkv//2)*hd] + scales [B, Hkv, T]: window
    tokens not yet appended.
    """
    B, T, Hq, hd = q.shape
    k4, layer_arr = _stack(k_cache, layer)
    v4, _ = _stack(v_cache, layer)
    ks4, _ = _stack(k_scale, layer)
    vs4, _ = _stack(v_scale, layer)
    Kp = k4.shape[3]
    Hkv = ks4.shape[2]
    assert Kp == (Hkv // 2) * hd and Hkv % 2 == 0, (Kp, Hkv, hd)
    K = Hkv * hd
    G = Hq // Hkv
    assert k4.shape[2] % block_s == 0, (k4.shape, block_s)
    fresh = k_new is not None
    fresh_ops = ((k_new, v_new, ks_new, vs_new) if fresh else ())

    qg = _pack_q(q, Hkv, K)
    kernel = functools.partial(_decode_quant4_kernel, T=T, block_s=block_s,
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd,
                               fresh=fresh)
    out = _decode_call(kernel, qg, k4, v4, layer_arr, base_lens, Kq=K,
                       block_s=block_s, scratch_hd=hd, n_kv=Hkv, T=T,
                       interpret=interpret, extras=(ks4, vs4),
                       fresh_ops=fresh_ops)
    return _unpack_o(out, Hkv, G, T, hd)
