"""Pallas TPU paged flash-decode attention + aliased paged appends.

TPU-native counterpart of flashinfer's BatchDecodeWithPagedKVCacheWrapper
(reference Engine/SnapKV/backend.py:56-107 runs all decode/verify through
paged flashinfer wrappers): requests read/write a shared PAGE POOL through a
per-request page table instead of owning a contiguous [S, K] cache row.  The
pool amortizes HBM across requests with ragged lengths — continuous-batching
capacity is governed by the sum of actual lengths, not B * max_seq_len.

Design (everything else matches ops/pallas/decode_attention.py — the kernel
BODIES are shared, only the BlockSpec index maps differ):

- pools are [L, P, page_size, Hkv*hd] (+ scale pools [L, P, Hkv, page_size]
  when quantized); page_size is the KV block: TPU-native paging wants BIG
  pages (>= 512 rows) because small blocks leave the decode kernel
  MXU-latency-bound (ops/attention._pick_block_s) — fragmentation at 1B-scale
  contexts is cheap, bandwidth is not.
- the page table rides as a scalar-prefetch operand; the KV index map
  dereferences ``table[b, j]`` so the pipeline fetches pages in logical
  order.  Blocks past a request's length clamp to the last visible page
  (fetch-dedup'd), exactly like the contiguous kernels' length clamp.
- page assignment is host-side (native/runtime.cpp PageAllocator) at
  admission-wave boundaries; tables are static inside the jitted decode loop,
  so there is no per-step host plan() — the reference re-plans flashinfer
  wrappers on the host every step (backend.py:181-197).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magicdec_tpu.ops.pallas import decode_attention as DA
from magicdec_tpu.ops.kv_cache import _merge_rows_block, _merge_scale_block


def _drop_table(kernel):
    """Adapt a contiguous-decode kernel (layer_ref, lens_ref, ...) to the
    paged prefetch order (layer_ref, lens_ref, table_ref, ...)."""
    def wrapped(layer_ref, lens_ref, table_ref, *args):
        return kernel(layer_ref, lens_ref, *args)
    return wrapped


def _paged_call(kernel, q, kp, vp, layer_arr, base_lens, table, *, Kq,
                scratch_hd, n_kv, T, interpret, extras=(), fresh_ops=()):
    """Shared pallas_call plumbing for the paged decode kernels.

    kp/vp: [L, P, ps, Kc]; table: [B, npr] int32 (logical block j of request
    b lives in pool page table[b, j]); extras = (k_scale_pool, v_scale_pool)
    as [L, P, Hkv, ps] when quantized; q packed [B, GT, Kq]; fresh_ops as in
    decode_attention._decode_call."""
    B, GT, _ = q.shape
    ps = kp.shape[2]
    Kc = kp.shape[3]
    npr = table.shape[1]
    lens = base_lens.astype(jnp.int32)
    tbl = table.reshape(-1).astype(jnp.int32)
    T_clamp = 0 if fresh_ops else T

    def q_map(b, j, layer_ref, lens_ref, tbl_ref):
        return (b, 0, 0)

    def kv_map(b, j, layer_ref, lens_ref, tbl_ref):
        last = jnp.maximum(lens_ref[b] + T_clamp - 1, 0) // ps
        jc = jnp.minimum(j, last)
        return (layer_ref[0], tbl_ref[b * npr + jc], 0, 0)

    def scale_map(b, j, layer_ref, lens_ref, tbl_ref):
        last = jnp.maximum(lens_ref[b] + T_clamp - 1, 0) // ps
        jc = jnp.minimum(j, last)
        return (layer_ref[0], tbl_ref[b * npr + jc], 0, 0)

    in_specs = [
        pl.BlockSpec((1, GT, Kq), q_map),
        pl.BlockSpec((1, 1, ps, Kc), kv_map),
        pl.BlockSpec((1, 1, ps, Kc), kv_map),
    ]
    if extras:
        Hkv = extras[0].shape[2]
        in_specs += [pl.BlockSpec((1, 1, Hkv, ps), scale_map)] * 2
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
        num_scalar_prefetch=3,
        grid=(B, npr),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, GT, Kq), q_map),
        scratch_shapes=[
            pltpu.VMEM((n_kv, GT, 1), jnp.float32),
            pltpu.VMEM((n_kv, GT, 1), jnp.float32),
            pltpu.VMEM((n_kv, GT, scratch_hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _drop_table(kernel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, Kq), q.dtype),
        interpret=interpret,
    )(layer_arr, lens, tbl, q, kp, vp, *extras, *fresh_ops)


def _layer_arr(layer):
    return jnp.asarray(0 if layer is None else layer, jnp.int32).reshape(1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_paged_decode_attend(q, k_pool, v_pool, table, base_lens, *,
                              layer=None, k_new=None, v_new=None,
                              interpret: bool = False):
    """Paged flash_decode_attend.  q: [B, T, Hq, hd]; pools [L, P, ps, Hkv*hd];
    table [B, npr] int32; base_lens [B].  k_new/v_new [B, T, Hkv*hd]: window
    tokens not yet appended (the caller appends after attention)."""
    B, T, Hq, hd = q.shape
    K = k_pool.shape[3]
    Hkv = K // hd
    G = Hq // Hkv
    fresh = k_new is not None
    fresh_ops = ((k_new.reshape(B, T, K).astype(q.dtype),
                  v_new.reshape(B, T, K).astype(q.dtype)) if fresh else ())
    qg = DA._pack_q(q, Hkv, K)
    kernel = functools.partial(DA._decode_kernel, T=T,
                               block_s=k_pool.shape[2],
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd,
                               fresh=fresh)
    out = _paged_call(kernel, qg, k_pool, v_pool, _layer_arr(layer),
                      base_lens, table, Kq=K, scratch_hd=hd, n_kv=Hkv, T=T,
                      interpret=interpret, fresh_ops=fresh_ops)
    return DA._unpack_o(out, Hkv, G, T, hd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_paged_decode_attend_quant(q, k_pool, k_scale, v_pool, v_scale,
                                    table, base_lens, *, layer=None,
                                    k_new=None, v_new=None, ks_new=None,
                                    vs_new=None, interpret: bool = False):
    """Paged int8-KV decode: pools int8 [L, P, ps, Hkv*hd], scale pools
    [L, P, Hkv, ps] (f32 or bf16 — ops.kv_cache.quantize_kv_tokens layout,
    per page)."""
    B, T, Hq, hd = q.shape
    K = k_pool.shape[3]
    Hkv = K // hd
    G = Hq // Hkv
    fresh = k_new is not None
    fresh_ops = ()
    if fresh:
        fresh_ops = (k_new.reshape(B, T, K), v_new.reshape(B, T, K),
                     ks_new, vs_new)
    qg = DA._pack_q(q, Hkv, K)
    kernel = functools.partial(DA._decode_quant_kernel, T=T,
                               block_s=k_pool.shape[2],
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd,
                               fresh=fresh)
    out = _paged_call(kernel, qg, k_pool, v_pool, _layer_arr(layer),
                      base_lens, table, Kq=K, scratch_hd=hd, n_kv=Hkv, T=T,
                      interpret=interpret, extras=(k_scale, v_scale),
                      fresh_ops=fresh_ops)
    return DA._unpack_o(out, Hkv, G, T, hd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_paged_decode_attend_quant4(q, k_pool, k_scale, v_pool, v_scale,
                                     table, base_lens, *, layer=None,
                                     k_new=None, v_new=None, ks_new=None,
                                     vs_new=None, interpret: bool = False):
    """Paged int4-KV decode: pools head-pair nibble-packed int8
    [L, P, ps, (Hkv//2)*hd] (ops.kv_cache.pack_int4_heads), scale pools
    [L, P, Hkv, ps]."""
    B, T, Hq, hd = q.shape
    Hkv = k_scale.shape[2]
    G = Hq // Hkv
    Kp = k_pool.shape[3]
    fresh = k_new is not None
    fresh_ops = ()
    if fresh:
        fresh_ops = (k_new.reshape(B, T, Kp), v_new.reshape(B, T, Kp),
                     ks_new, vs_new)
    # int4 q packs head PAIRS: per-head lanes live in nibble planes, so the
    # packed q keeps the dense head layout (Kq = Hkv*hd)
    qg = DA._pack_q(q, Hkv, Hkv * hd)
    kernel = functools.partial(DA._decode_quant4_kernel, T=T,
                               block_s=k_pool.shape[2],
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd,
                               fresh=fresh)
    out = _paged_call(kernel, qg, k_pool, v_pool, _layer_arr(layer),
                      base_lens, table, Kq=Hkv * hd, scratch_hd=hd, n_kv=Hkv,
                      T=T, interpret=interpret, extras=(k_scale, v_scale),
                      fresh_ops=fresh_ops)
    return DA._unpack_o(out, Hkv, G, T, hd)


# ---------------------------------------------------------------------------
# Aliased in-place paged appends (see ops/kv_cache.append_all_rows_inplace:
# the input_output_aliases contract is what keeps the POOL from being
# defensively copied every step)
# ---------------------------------------------------------------------------

def append_paged_rows_inplace(pool_k, pool_v, rows_k, rows_v, write_pos,
                              table, scale_k=None, scale_v=None,
                              srows_k=None, srows_v=None, *,
                              interpret: bool = False):
    """ONE aliased pallas call appending k + v (+ scale rows) into the page
    pool.  pool_k/pool_v [L, P, ps, Kc]; rows [L, B, T, Kc]; write_pos [B]
    (logical fill); table [B, npr]; scale pools [L, P, H, ps] + srows
    [L, B, H, T].  Returns (pool_k, pool_v[, scale_k, scale_v]).

    Grid (L_group, B, touched-blocks); the 8-row RMW blocks are 8-aligned in
    LOGICAL space, so each lies inside exactly one page (ps % 8 == 0); the
    index maps dereference the table, the merge math runs in logical rows."""
    L, P, ps, Kc = pool_k.shape
    B, npr = table.shape
    T = rows_k.shape[2]
    S = npr * ps  # logical capacity per request
    Tp = (T + 7) // 8 * 8
    if T < Tp:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        rows_k = jnp.pad(rows_k, pad)
        rows_v = jnp.pad(rows_v, pad)
    quant = scale_k is not None
    if quant:
        H = scale_k.shape[2]
        if T < Tp:
            spad = ((0, 0), (0, 0), (0, 0), (0, Tp - T))
            srows_k = jnp.pad(srows_k, spad)
            srows_v = jnp.pad(srows_v, spad)

    # prefetch: (write_pos, flat table)
    tbl = table.reshape(-1).astype(jnp.int32)

    esz = jnp.dtype(pool_k.dtype).itemsize
    per_layer = 2 * Tp * Kc * esz + 4 * 8 * Kc * esz
    if quant:
        per_layer += 2 * H * Tp * 4 + 4 * H * 128 * 4
    Lb = 1
    for cand in range(L, 0, -1):
        if L % cand == 0 and per_layer * cand * 2 <= 8 * 1024 * 1024:
            Lb = cand
            break
    n_lg = L // Lb

    def new_map(g, b, t, pr, tb):
        return (g, b, 0, 0)

    def blk_map(g, b, t, pr, tb):
        g8 = jnp.minimum(pr[b] // 8 + t, S // 8 - 1)  # logical 8-row block
        page = tb[b * npr + (g8 * 8) // ps]
        return (g, page, (g8 * 8) % ps // 8, 0)

    # scale column blocks must not straddle a page: a lane tile (128) when
    # ps >= 128, else the whole page (CPU-test page sizes)
    cw = min(128, ps)

    def sblk_map(g, b, t, pr, tb):
        gc = jnp.minimum(pr[b] // cw + t, S // cw - 1)  # logical col block
        page = tb[b * npr + (gc * cw) // ps]
        return (g, page, 0, (gc * cw) % ps // cw)

    nblk = (T + 6) // 8 + 1
    row_kw = dict(T=T, Tp=Tp, S=S)

    if not quant:
        def kernel(pos_ref, tbl_ref, rk_ref, rv_ref, ck_ref, cv_ref,
                   ok_ref, ov_ref):
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
            num_scalar_prefetch=2, grid=(n_lg, B, nblk),
            in_specs=[pl.BlockSpec((Lb, 1, Tp, Kc), new_map)] * 2
            + [pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2,
            out_specs=[pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype)] * 2,
            input_output_aliases={4: 0, 5: 1},
            interpret=interpret,
        )(write_pos.astype(jnp.int32), tbl, rows_k, rows_v, pool_k, pool_v)

    sc_kw = dict(T=T, Tp=Tp, S=S, width=cw)

    def kernel(pos_ref, tbl_ref, rk_ref, rv_ref, srk_ref, srv_ref,
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
        num_scalar_prefetch=2, grid=(n_lg, B, nblk),
        in_specs=[pl.BlockSpec((Lb, 1, Tp, Kc), new_map)] * 2
        + [pl.BlockSpec((Lb, 1, H, Tp), new_map)] * 2
        + [pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2
        + [pl.BlockSpec((Lb, 1, H, cw), sblk_map)] * 2,
        out_specs=[pl.BlockSpec((Lb, 1, 8, Kc), blk_map)] * 2
        + [pl.BlockSpec((Lb, 1, H, cw), sblk_map)] * 2,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype)] * 2
        + [jax.ShapeDtypeStruct(scale_k.shape, scale_k.dtype)] * 2,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
    )(write_pos.astype(jnp.int32), tbl, rows_k, rows_v, srows_k, srows_v,
      pool_k, pool_v, scale_k, scale_v)
