"""KV cache primitives: fixed-shape, length-governed, functional.

Design: where the reference uses flashinfer paged-KV CSR tables with pages
statically owned per request (Engine/SnapKV/backend.py:270-287 — request *i*
owns pages ``[i*max_pages, (i+1)*max_pages)``, no dynamic allocator), the
TPU-native layout collapses that to a contiguous per-request region indexed by
an int32 length vector.  All "rollback" in speculative decoding is length
arithmetic (tests/SnapKV/selfspec_benchmark.py:164-181); slots past the length
are garbage and masked out of attention, exactly as in the reference.

Cache layout per layer: ``[B, S_max, H_kv * head_dim]`` — the head axis is
folded into the minor (lane) dimension so the array tiles exactly on TPU.
Keeping head_dim (64 for llama-3.2-1b) minor instead would be padded 2x to the
128-lane tile: +100% HBM and bandwidth (measured: OOM at B=32/8k on v5e).
Appends are also transpose-free in this layout (the kv projection emits
[B, T, H_kv*head_dim] directly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heads_view(cache: jnp.ndarray, n_kv: int) -> jnp.ndarray:
    """[B, S, H*hd] -> [B, S, H, hd] (free reshape: contiguous lane split)."""
    B, S, K = cache.shape
    return cache.reshape(B, S, n_kv, K // n_kv)


def append_kv(k_cache: jnp.ndarray, v_cache: jnp.ndarray,
              k_new: jnp.ndarray, v_new: jnp.ndarray,
              write_pos: jnp.ndarray):
    """Append T new tokens per request at per-request positions.

    k_cache/v_cache: [B, S, H_kv*hd];  k_new/v_new: [B, T, H_kv, hd];
    write_pos: [B] int32 — the first slot to write for each request.
    Returns updated (k_cache, v_cache).

    Equivalent of flashinfer ``append_paged_kv_cache`` (Engine/utils.py:31-66)
    for the contiguous layout.  Implemented as a vmapped dynamic_update_slice,
    which XLA lowers to an in-place update when the caller owns the buffer.
    """
    B, T = k_new.shape[:2]
    k_new = k_new.reshape(B, T, -1).astype(k_cache.dtype)
    v_new = v_new.reshape(B, T, -1).astype(v_cache.dtype)

    def _upd(cache_b, new_b, pos_b):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (pos_b, 0))

    k_cache = jax.vmap(_upd)(k_cache, k_new, write_pos)
    v_cache = jax.vmap(_upd)(v_cache, v_new, write_pos)
    return k_cache, v_cache


def quantize_kv_tokens(x: jnp.ndarray, scale_dtype=jnp.float32):
    """Per-(token, kv-head) symmetric int8 quantization of new KV entries.

    x: [B, T, H_kv, hd] -> (q int8 [B, T, H_kv*hd], scale [B, H_kv, T] in
    ``scale_dtype``).  The scale layout keeps the cache-length axis minor so
    the [L, B, H_kv, S] scale array tiles on TPU without lane padding and
    slices into the decode kernel as a lane row vector
    (ops/pallas/decode_attention.py).  ``scale_dtype=bf16`` halves scale
    memory/traffic; q is computed against the ROUNDED scale so dequant is
    exactly q * stored_scale in every path.

    No reference equivalent — the reference keeps bf16 caches; this is the
    TPU-native answer to decode being KV-bandwidth-bound (MagicDec §1,
    arXiv:2408.11049): int8 halves the bytes the verify/decode kernels stream.
    """
    B, T = x.shape[:2]
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)                      # [B, T, H]
    scale = (jnp.maximum(amax, 1e-8) / 127.0).astype(scale_dtype)
    sf = scale.astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / sf[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(B, T, -1), jnp.swapaxes(scale, 1, 2)


def append_kv_quant(k_cache, v_cache, k_scale, v_scale, k_new, v_new,
                    write_pos):
    """append_kv for int8 caches: quantize the T new tokens and write data +
    scales at per-request positions.

    k_cache/v_cache: int8 [B, S, H_kv*hd]; k_scale/v_scale: f32 [B, H_kv, S];
    k_new/v_new: [B, T, H_kv, hd] (bf16/f32); write_pos: [B] int32.
    """
    kq, ks_new = quantize_kv_tokens(k_new)
    vq, vs_new = quantize_kv_tokens(v_new)

    def _upd(cache_b, new_b, pos_b):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (pos_b, 0))

    def _upd_scale(s_b, new_b, pos_b):
        return jax.lax.dynamic_update_slice(s_b, new_b, (0, pos_b))

    k_cache = jax.vmap(_upd)(k_cache, kq, write_pos)
    v_cache = jax.vmap(_upd)(v_cache, vq, write_pos)
    k_scale = jax.vmap(_upd_scale)(k_scale, ks_new, write_pos)
    v_scale = jax.vmap(_upd_scale)(v_scale, vs_new, write_pos)
    return k_cache, v_cache, k_scale, v_scale


def dequant_kv(cache: jnp.ndarray, scale: jnp.ndarray, head_dim: int,
               dtype=jnp.float32) -> jnp.ndarray:
    """Quantized cache -> dense [B, S, H*hd] in `dtype`.

    int8 layout: cache [B, S, H*hd].  int4 layout: cache [B, S, (H//2)*hd]
    packed (pack_int4_heads).  The layout is detected from the lane width vs
    the scale's head count, so callers are layout-agnostic.
    """
    B, S, K = cache.shape
    H = scale.shape[1]
    if K == (H // 2) * head_dim:  # int4 head-pair packing
        x = unpack_int4_heads(cache, head_dim).astype(jnp.float32)
    else:
        x = cache.reshape(B, S, H, head_dim).astype(jnp.float32)
    x = x * jnp.swapaxes(scale, 1, 2)[..., None]
    return x.reshape(B, S, H * head_dim).astype(dtype)


# ---------------------------------------------------------------------------
# int4 KV (adjacent-head nibble packing)
# ---------------------------------------------------------------------------
#
# Packing convention: kv-head 2i rides the LOW nibble and kv-head 2i+1 the
# HIGH nibble of packed pseudo-head i, lane-for-lane — packed lane
# i*hd + l holds (head 2i, lane l) | (head 2i+1, lane l) << 4.  Pairing
# *adjacent* heads keeps the packed lane dimension shardable across the model
# axis with the same head-contiguous splits as the dense cache (a pair never
# straddles a shard as long as the local head count stays even).
# Values are symmetric int4 in [-7, 7]; scales stay per-(token, head) f32
# [B, H, S] — identical layout to the int8 path, so the attention kernels
# stream the same scale rows.  No reference equivalent (the reference keeps
# bf16 caches); this quarters the bytes the verify/decode kernels stream.


def pack_int4_heads(q: jnp.ndarray) -> jnp.ndarray:
    """int8 values in [-7, 7], [..., H, hd] (H even) -> packed int8
    [..., (H//2)*hd]."""
    *lead, H, hd = q.shape
    assert H % 2 == 0, f"int4 packing needs an even kv-head count, got {H}"
    pairs = q.reshape(*lead, H // 2, 2, hd)
    lo = pairs[..., 0, :] & jnp.int8(0x0F)
    hi = jnp.left_shift(pairs[..., 1, :], 4)
    return (lo | hi).reshape(*lead, (H // 2) * hd)


def unpack_int4_heads(packed: jnp.ndarray, head_dim: int) -> jnp.ndarray:
    """Packed int8 [..., (H//2)*hd] -> int8 values [..., H, hd] in [-7, 7]."""
    *lead, Kp = packed.shape
    Hp = Kp // head_dim
    p = packed.reshape(*lead, Hp, head_dim)
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)   # sign-extended low nibble
    hi = jnp.right_shift(p, 4)                      # arithmetic: high nibble
    return jnp.stack([lo, hi], axis=-2).reshape(*lead, 2 * Hp, head_dim)


def quantize_kv_tokens_int4(x: jnp.ndarray, scale_dtype=jnp.float32):
    """Per-(token, kv-head) symmetric int4 quantization + head-pair packing.

    x: [B, T, H, hd] -> (packed int8 [B, T, (H//2)*hd], scale [B, H, T] in
    ``scale_dtype``).  Same scale layout as quantize_kv_tokens so
    kernels/shardings are shared.
    """
    B, T = x.shape[:2]
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)                      # [B, T, H]
    scale = (jnp.maximum(amax, 1e-8) / 7.0).astype(scale_dtype)
    sf = scale.astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / sf[..., None]), -7, 7).astype(jnp.int8)
    return pack_int4_heads(q), jnp.swapaxes(scale, 1, 2)


def append_kv_quant4(k_cache, v_cache, k_scale, v_scale, k_new, v_new,
                     write_pos):
    """append_kv for int4-packed caches (layout of quantize_kv_tokens_int4).

    k_cache/v_cache: int8 [B, S, (H//2)*hd]; k_scale/v_scale: f32 [B, H, S];
    k_new/v_new: [B, T, H, hd] (bf16/f32); write_pos: [B] int32.
    """
    kq, ks_new = quantize_kv_tokens_int4(k_new)
    vq, vs_new = quantize_kv_tokens_int4(v_new)

    def _upd(cache_b, new_b, pos_b):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (pos_b, 0))

    def _upd_scale(s_b, new_b, pos_b):
        return jax.lax.dynamic_update_slice(s_b, new_b, (0, pos_b))

    k_cache = jax.vmap(_upd)(k_cache, kq, write_pos)
    v_cache = jax.vmap(_upd)(v_cache, vq, write_pos)
    k_scale = jax.vmap(_upd_scale)(k_scale, ks_new, write_pos)
    v_scale = jax.vmap(_upd_scale)(v_scale, vs_new, write_pos)
    return k_cache, v_cache, k_scale, v_scale


def gather_kv(k_cache: jnp.ndarray, v_cache: jnp.ndarray, indices: jnp.ndarray,
              n_kv: int):
    """Gather per-(batch, kv-head) cache entries.

    k_cache/v_cache: [B, S, H_kv*hd]; indices: [B, H_kv, N] int32.
    Returns (k, v) with shape [B, H_kv, N, hd].  Used by SnapKV draft-cache
    construction (reference Engine/SnapKV/model.py:431-438 gathers top-k
    positions per kv head).
    """
    kh = jnp.swapaxes(heads_view(k_cache, n_kv), 1, 2)  # [B, H, S, hd]
    vh = jnp.swapaxes(heads_view(v_cache, n_kv), 1, 2)
    return (jnp.take_along_axis(kh, indices[..., None], axis=2),
            jnp.take_along_axis(vh, indices[..., None], axis=2))


# ---------------------------------------------------------------------------
# Layer-stacked appends (zero-copy layer scan)
# ---------------------------------------------------------------------------
#
# The layer scan is read-only over the stacked [L, B, S, ...] caches; each
# layer's new KV is collected as scan ys and appended ONCE per forward —
# in place via the aliased pallas RMW kernels below on the flash path, or via
# the jnp scatters (which XLA pairs with a defensive full-cache copy whenever
# attention custom calls read the same buffer — fine on CPU/tests only).


def append_rows_all_layers(cache, rows, write_pos):
    """One batched append of every layer's new rows after the layer scan.

    cache [L, B, S, Kc]; rows [L, B, T, Kc] (scan-stacked per-layer outputs);
    write_pos [B].  Appending once per forward — instead of per layer inside
    the scan — keeps the cache buffer on a single-ownership chain (carry ->
    kernels (read) -> this scatter), which XLA updates in place; a per-layer
    scatter interleaved with kernel reads forces full-cache copies.
    """
    def _upd(cache_b, rows_b, pos_b):  # [L, S, Kc], [L, T, Kc]
        return jax.lax.dynamic_update_slice(cache_b, rows_b.astype(cache_b.dtype),
                                            (0, pos_b, 0))
    return jax.vmap(_upd, in_axes=(1, 1, 0), out_axes=1)(cache, rows, write_pos)


def append_scale_rows_all_layers(scale, rows, write_pos):
    """Scale counterpart: scale [L, B, H, S]; rows [L, B, H, T]."""
    def _upd(s_b, r_b, pos_b):  # [L, H, S], [L, H, T]
        return jax.lax.dynamic_update_slice(s_b, r_b, (0, 0, pos_b))
    return jax.vmap(_upd, in_axes=(1, 1, 0), out_axes=1)(scale, rows, write_pos)


def _inplace_rows_kernel(pos_ref, new_ref, cache_ref, out_ref, *, T, Tp, S):
    """RMW one 8-row block: copy-through + merge the new rows that land in
    it.  Idempotent in the block index (the row-range test is global), so the
    clamped second grid step is safe when the window fits one block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b = pl.program_id(1)
    t = pl.program_id(2)
    pos = pos_ref[b]
    jb = jnp.minimum(pos // 8 + t, S // 8 - 1)
    grow = jb * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    in_range = (grow >= pos) & (grow < pos + T)
    idx = jnp.clip(grow - pos, 0, Tp - 1)
    sel = (idx == jax.lax.broadcasted_iota(jnp.int32, (8, Tp), 1)).astype(jnp.float32)
    merged = jax.lax.dot_general(sel, new_ref[0].astype(jnp.float32),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    out_ref[0, 0] = jnp.where(in_range, merged.astype(out_ref.dtype),
                              cache_ref[0, 0])


def _inplace_scale_kernel(pos_ref, new_ref, scale_ref, out_ref, *, T, Tp, S):
    """Scale counterpart: RMW one 128-column block of [H, S]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b = pl.program_id(1)
    t = pl.program_id(2)
    pos = pos_ref[b]
    cb = jnp.minimum(pos // 128 + t, S // 128 - 1)
    H = new_ref.shape[1]
    gcol = cb * 128 + jax.lax.broadcasted_iota(jnp.int32, (Tp, 128), 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (Tp, 128), 0)
    sel = (gcol - pos == idx).astype(jnp.float32)                  # [Tp, 128]
    merged = jax.lax.dot_general(new_ref[0].astype(jnp.float32), sel,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [H,128]
    col1 = cb * 128 + jax.lax.broadcasted_iota(jnp.int32, (H, 128), 1)
    in_range = (col1 >= pos) & (col1 < pos + T)
    out_ref[0, 0] = jnp.where(in_range, merged.astype(out_ref.dtype),
                              scale_ref[0, 0])


def append_rows_inplace(cache, rows, write_pos, *, interpret=False):
    """In-place (aliased) pallas append.

    cache [L, B, S, Kc]; rows [L, B, T, Kc]; write_pos [B].  Unlike the jnp
    scatter, the input_output_aliases contract TELLS XLA the update is
    in-place, so no defensive full-cache copy is inserted even though the
    attention custom calls read the same buffer within the step (the scatter
    version costs one full-cache r/w pass per decode step AND doubles peak
    HBM — bf16 at 8k/B=32 OOMs).  RMW granularity: the T//8 + 1 eight-row
    blocks the window touches per (layer, request); interior blocks are fully
    overwritten, boundary blocks merge with the old content (idempotent in
    the block index, so clamped grid steps are safe).
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools as _ft

    L, B, S, Kc = cache.shape
    T = rows.shape[2]
    Tp = (T + 7) // 8 * 8
    if T < Tp:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

    def new_map(l, b, t, pr):
        return (l, b, 0, 0)

    def blk_map(l, b, t, pr):
        return (l, b, jnp.minimum(pr[b] // 8 + t, S // 8 - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B, (T + 6) // 8 + 1),
        in_specs=[
            pl.BlockSpec((1, 1, Tp, Kc), new_map),
            pl.BlockSpec((1, 1, 8, Kc), blk_map),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, Kc), blk_map),
    )
    kern = _ft.partial(_inplace_rows_kernel, T=T, Tp=Tp, S=S)

    def kernel(pos_ref, new_ref, cache_ref, out_ref):
        # grid leading dim is L; reuse the row kernel (it only uses b, t)
        kern(pos_ref, new_ref[0], cache_ref, out_ref)

    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(write_pos.astype(jnp.int32), rows, cache)


def _merge_rows_block(pos, t, new_f32, cache_blk, out_dtype, *, T, Tp, S):
    """Shared 8-row RMW merge (see _inplace_rows_kernel)."""
    jb = jnp.minimum(pos // 8 + t, S // 8 - 1)
    grow = jb * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    in_range = (grow >= pos) & (grow < pos + T)
    idx = jnp.clip(grow - pos, 0, Tp - 1)
    sel = (idx == jax.lax.broadcasted_iota(jnp.int32, (8, Tp), 1)).astype(jnp.float32)
    merged = jax.lax.dot_general(sel, new_f32, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return jnp.where(in_range, merged.astype(out_dtype), cache_blk)


def _merge_scale_block(pos, t, new_f32, scale_blk, out_dtype, *, T, Tp, S,
                       width: int = 128):
    """Shared `width`-column RMW merge (see _inplace_scale_kernel).  width is
    a lane tile (128) except for paged pools whose page_size is smaller than
    a tile — a column block must not straddle a page (CPU-test page sizes)."""
    cb = jnp.minimum(pos // width + t, S // width - 1)
    H = new_f32.shape[0]
    gcol = cb * width + jax.lax.broadcasted_iota(jnp.int32, (Tp, width), 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (Tp, width), 0)
    sel = (gcol - pos == idx).astype(jnp.float32)
    merged = jax.lax.dot_general(new_f32, sel, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    col1 = cb * width + jax.lax.broadcasted_iota(jnp.int32, (H, width), 1)
    in_range = (col1 >= pos) & (col1 < pos + T)
    return jnp.where(in_range, merged.astype(out_dtype), scale_blk)


def append_all_rows_inplace(cache_k, cache_v, rows_k, rows_v, write_pos,
                            scale_k=None, scale_v=None,
                            srows_k=None, srows_v=None, *, interpret=False):
    """ONE aliased pallas call appending k + v (+ their scale rows when the
    cache is quantized) — vs one call per array, whose (L, B, blocks) grids of
    tiny 4-8 KB copy-through DMAs are pure per-call overhead repeated 2-4x.

    cache_k/cache_v [L, B, S, Kc]; rows_k/rows_v [L, B, T, Kc]; write_pos [B];
    scale_k/scale_v [L, B, H, S] + srows_k/srows_v [L, B, H, T] (quantized).
    Returns (cache_k, cache_v[, scale_k, scale_v]).
    """
    import functools as _ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B, S, Kc = cache_k.shape
    T = rows_k.shape[2]
    Tp = (T + 7) // 8 * 8
    if T < Tp:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        rows_k = jnp.pad(rows_k, pad)
        rows_v = jnp.pad(rows_v, pad)
    quant = scale_k is not None
    if quant:
        Ssc = scale_k.shape[3]
        if T < Tp:
            spad = ((0, 0), (0, 0), (0, 0), (0, Tp - T))
            srows_k = jnp.pad(srows_k, spad)
            srows_v = jnp.pad(srows_v, spad)
        H = scale_k.shape[2]

    # blocks span a GROUP of Lb layers at one (request, S-offset): the write
    # position depends only on b, so grid (L/Lb, B, nblk) moves Lb*8*Kc per
    # step instead of an (L, B, nblk) grid of tiny per-layer DMAs.  Lb is the
    # largest divisor of L whose double-buffered blocks fit scoped VMEM
    # (16 MiB): decode windows (Tp = 8) take the whole stack, prefill chunks
    # (Tp = 512) take 2-4 layers.
    esz = jnp.dtype(cache_k.dtype).itemsize
    per_layer = 2 * Tp * Kc * esz + 4 * 8 * Kc * esz
    if quant:
        per_layer += 2 * H * Tp * 4 + 4 * H * 128 * 4
    Lb = 1
    for cand in range(L, 0, -1):
        if L % cand == 0 and per_layer * cand * 2 <= 8 * 1024 * 1024:
            Lb = cand
            break
    n_lg = L // Lb

    def new_map(g, b, t, pr):
        return (g, b, 0, 0)

    def blk_map(g, b, t, pr):
        return (g, b, jnp.minimum(pr[b] // 8 + t, S // 8 - 1), 0)

    def sblk_map(g, b, t, pr):
        return (g, b, 0, jnp.minimum(pr[b] // 128 + t, Ssc // 128 - 1))

    nblk = (T + 6) // 8 + 1
    row_kw = dict(T=T, Tp=Tp, S=S)

    if not quant:
        def kernel(pos_ref, rk_ref, rv_ref, ck_ref, cv_ref, ok_ref, ov_ref):
            b, t = pl.program_id(1), pl.program_id(2)
            pos = pos_ref[b]
            for l in range(Lb):
                ok_ref[l, 0] = _merge_rows_block(
                    pos, t, rk_ref[l, 0].astype(jnp.float32), ck_ref[l, 0],
                    ok_ref.dtype, **row_kw)
                ov_ref[l, 0] = _merge_rows_block(
                    pos, t, rv_ref[l, 0].astype(jnp.float32), cv_ref[l, 0],
                    ov_ref.dtype, **row_kw)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_lg, B, nblk),
            in_specs=[pl.BlockSpec((Lb, 1, Tp, Kc), new_map)] * 2
            + [pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2,
            out_specs=[pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)] * 2,
            input_output_aliases={3: 0, 4: 1},
            interpret=interpret,
        )(write_pos.astype(jnp.int32), rows_k, rows_v, cache_k, cache_v)

    sc_kw = dict(T=T, Tp=Tp, S=Ssc)

    def kernel(pos_ref, rk_ref, rv_ref, srk_ref, srv_ref,
               ck_ref, cv_ref, sk_ref, sv_ref,
               ok_ref, ov_ref, osk_ref, osv_ref):
        b, t = pl.program_id(1), pl.program_id(2)
        pos = pos_ref[b]
        for l in range(Lb):
            ok_ref[l, 0] = _merge_rows_block(
                pos, t, rk_ref[l, 0].astype(jnp.float32), ck_ref[l, 0],
                ok_ref.dtype, **row_kw)
            ov_ref[l, 0] = _merge_rows_block(
                pos, t, rv_ref[l, 0].astype(jnp.float32), cv_ref[l, 0],
                ov_ref.dtype, **row_kw)
            osk_ref[l, 0] = _merge_scale_block(
                pos, t, srk_ref[l, 0].astype(jnp.float32), sk_ref[l, 0],
                osk_ref.dtype, **sc_kw)
            osv_ref[l, 0] = _merge_scale_block(
                pos, t, srv_ref[l, 0].astype(jnp.float32), sv_ref[l, 0],
                osv_ref.dtype, **sc_kw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_lg, B, nblk),
        in_specs=[pl.BlockSpec((Lb, 1, Tp, Kc), new_map)] * 2
        + [pl.BlockSpec((Lb, 1, H, Tp), new_map)] * 2
        + [pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2
        + [pl.BlockSpec((Lb, 1, H, 128), sblk_map)] * 2,
        out_specs=[pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2
        + [pl.BlockSpec((Lb, 1, H, 128), sblk_map)] * 2,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype)] * 2
        + [jax.ShapeDtypeStruct(scale_k.shape, scale_k.dtype)] * 2,
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(write_pos.astype(jnp.int32), rows_k, rows_v, srows_k, srows_v,
      cache_k, cache_v, scale_k, scale_v)


def append_scale_rows_inplace(scale, rows, write_pos, *, interpret=False):
    """Scale counterpart: scale [L, B, H, S]; rows [L, B, H, T] (T <= 8)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools as _ft

    L, B, H, S = scale.shape
    T = rows.shape[3]
    Tp = (T + 7) // 8 * 8
    if T < Tp:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (0, Tp - T)))

    def new_map(l, b, t, pr):
        return (l, b, 0, 0)

    def blk_map(l, b, t, pr):
        return (l, b, 0, jnp.minimum(pr[b] // 128 + t, S // 128 - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B, (T + 126) // 128 + 1),
        in_specs=[
            pl.BlockSpec((1, 1, H, Tp), new_map),
            pl.BlockSpec((1, 1, H, 128), blk_map),
        ],
        out_specs=pl.BlockSpec((1, 1, H, 128), blk_map),
    )
    kern = _ft.partial(_inplace_scale_kernel, T=T, Tp=Tp, S=S)

    def kernel(pos_ref, new_ref, scale_ref, out_ref):
        kern(pos_ref, new_ref[0], scale_ref, out_ref)

    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(scale.shape, scale.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(write_pos.astype(jnp.int32), rows, scale)
