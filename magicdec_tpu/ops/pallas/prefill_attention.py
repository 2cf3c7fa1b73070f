"""Pallas TPU flash attention for chunked prefill.

Replacement for flashinfer's batch prefill path (reference
Engine/SnapKV/backend.py:231-287): a C-token query chunk attends the cache
prefix [0, base+C) with causal end-alignment.  Unlike decode (bandwidth-bound,
tiny q), prefill is MXU-bound, so the kernel blocks query rows as well as KV
columns and never materialises the [C, S] score matrix in HBM — the jnp oracle
path writes O(B·H·C·S) fp32 scores, which dominates prefill time at long
context.

Caches are [B, S, H_kv*hd] or layer-stacked [L, B, S, H_kv*hd] with a
prefetched layer index (see ops/pallas/decode_attention.py — avoiding the
per-layer slice materialisation that a custom-call operand forces).

Grid: (B, row_blocks, kv_blocks); kv innermost (sequential) so the online
softmax scratch for one row block is valid across its kv sweep.  KV heads are
folded into the kernel like decode_attention.  base_lens is scalar-prefetched;
kv blocks past base+C are clamp-deduped in the index map and skipped.
block_s must stay modest (<=512): the row blocks and (for int4) unpack
temporaries already use most of the 16 MiB scoped VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magicdec_tpu.ops.pallas.decode_attention import (_online_update, _pack_q,
                                                      _quant_online_update,
                                                      _stack,
                                                      _unpack_int4_planes,
                                                      _unpack_o)

NEG_INF = -1e30


def _prefill_kernel(layer_ref, lens_ref, q_ref, k_ref, v_ref, *rest,
                    C: int, block_r: int,
                    block_s: int, scale: float, n_kv: int, hd: int,
                    fresh: bool):
    """``fresh``: the C chunk tokens ride as [1, C, K] operands processed at
    j == 0 with in-chunk causal masking; the cache is visible to col < base
    only (see decode_attention._decode_kernel)."""
    if fresh:
        kn_ref, vn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    r = pl.program_id(1)
    j = pl.program_id(2)
    nblocks = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = lens_ref[b]
    start = j * block_s
    # rows are (g, t) with t minor within each head; global row = r*block_r + i
    row0 = r * block_r
    col = start + jax.lax.broadcasted_iota(jnp.int32, (block_r, block_s), 1)
    row_t = (row0 + jax.lax.broadcasted_iota(jnp.int32, (block_r, block_s), 0)) % C
    visible = col < (base if fresh else base + row_t + 1)
    # skip kv blocks no row of this block can see
    any_visible = start < (base if fresh else base + C)

    if fresh:
        @pl.when(j == 0)
        def _fresh():
            colC = jax.lax.broadcasted_iota(jnp.int32, (block_r, C), 1)
            rowC = (row0 + jax.lax.broadcasted_iota(jnp.int32, (block_r, C), 0)) % C
            vis = colC <= rowC
            for h in range(n_kv):
                q = q_ref[0, :, h * hd:(h + 1) * hd]
                kn = kn_ref[0, :, h * hd:(h + 1) * hd]
                vn = vn_ref[0, :, h * hd:(h + 1) * hd]
                s = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                s = jnp.where(vis, s, NEG_INF)
                _online_update(h, s, vn, m_scr, l_scr, acc_scr)

    @pl.when(any_visible)
    def _compute():
        for h in range(n_kv):
            q = q_ref[0, :, h * hd:(h + 1) * hd]             # [BR, hd] bf16
            k = k_ref[0, 0, :, h * hd:(h + 1) * hd]          # [BS, hd]
            v = v_ref[0, 0, :, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(visible, s, NEG_INF)
            _online_update(h, s, v, m_scr, l_scr, acc_scr)

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _prefill_quant_kernel(layer_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref,
                          vs_ref, *rest, C: int,
                          block_r: int, block_s: int, scale: float, n_kv: int,
                          hd: int, fresh: bool):
    """int8-KV prefill: same structure as _prefill_kernel, with the
    per-(token, head) scales streamed as [1, 1, n_kv, block_s] lane rows — the
    k scale multiplies score columns after the q.k dot, the v scale folds into
    p before the p.v dot (no dense dequantized cache is ever materialised).
    ``fresh`` chunk tokens ride as int8 [1, C, K] + scales [1, n_kv, C]."""
    if fresh:
        kn_ref, vn_ref, ksn_ref, vsn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    r = pl.program_id(1)
    j = pl.program_id(2)
    nblocks = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = lens_ref[b]
    start = j * block_s
    row0 = r * block_r
    col = start + jax.lax.broadcasted_iota(jnp.int32, (block_r, block_s), 1)
    row_t = (row0 + jax.lax.broadcasted_iota(jnp.int32, (block_r, block_s), 0)) % C
    visible = col < (base if fresh else base + row_t + 1)
    any_visible = start < (base if fresh else base + C)

    if fresh:
        @pl.when(j == 0)
        def _fresh():
            colC = jax.lax.broadcasted_iota(jnp.int32, (block_r, C), 1)
            rowC = (row0 + jax.lax.broadcasted_iota(jnp.int32, (block_r, C), 0)) % C
            vis = colC <= rowC
            for h in range(n_kv):
                q = q_ref[0, :, h * hd:(h + 1) * hd]
                kn = kn_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)
                vn = vn_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)
                s = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                _quant_online_update(h, s, vis, ksn_ref[0, h, :],
                                     vsn_ref[0, h, :], vn, scale,
                                     m_scr, l_scr, acc_scr)

    @pl.when(any_visible)
    def _compute():
        for h in range(n_kv):
            q = q_ref[0, :, h * hd:(h + 1) * hd]
            k = k_ref[0, 0, :, h * hd:(h + 1) * hd].astype(q.dtype)
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


def _prefill_quant4_kernel(layer_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref,
                           vs_ref, *rest, C: int,
                           block_r: int, block_s: int, scale: float,
                           n_kv: int, hd: int, fresh: bool):
    """int4-KV prefill: head-pair-packed int8 KV blocks (quarter of bf16's
    bytes) unpacked to nibble planes once per block; otherwise identical to
    _prefill_quant_kernel."""
    if fresh:
        kn_ref, vn_ref, ksn_ref, vsn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    r = pl.program_id(1)
    j = pl.program_id(2)
    nblocks = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    base = lens_ref[b]
    start = j * block_s
    row0 = r * block_r
    col = start + jax.lax.broadcasted_iota(jnp.int32, (block_r, block_s), 1)
    row_t = (row0 + jax.lax.broadcasted_iota(jnp.int32, (block_r, block_s), 0)) % C
    visible = col < (base if fresh else base + row_t + 1)
    any_visible = start < (base if fresh else base + C)
    qdt = q_ref.dtype

    if fresh:
        @pl.when(j == 0)
        def _fresh():
            colC = jax.lax.broadcasted_iota(jnp.int32, (block_r, C), 1)
            rowC = (row0 + jax.lax.broadcasted_iota(jnp.int32, (block_r, C), 0)) % C
            vis = colC <= rowC
            knlo, knhi = _unpack_int4_planes(kn_ref[0], qdt)
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

    @pl.when(any_visible)
    def _compute():
        klo, khi = _unpack_int4_planes(k_ref[0, 0], qdt)
        vlo, vhi = _unpack_int4_planes(v_ref[0, 0], qdt)
        for h in range(n_kv):
            off = (h // 2) * hd
            k = (khi if h % 2 else klo)[:, off:off + hd]
            v = (vhi if h % 2 else vlo)[:, off:off + hd]
            q = q_ref[0, :, h * hd:(h + 1) * hd]
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


def _prefill_call(kernel, q, k4, v4, layer_arr, base_lens, *, Kq, C, block_r,
                  block_s, scratch_hd, n_kv, interpret, extras=(),
                  fresh_ops=()):
    B, GT, _ = q.shape
    S = k4.shape[2]
    n_row_blocks = GT // block_r
    nblocks = S // block_s
    lens = base_lens.astype(jnp.int32)
    Kc = k4.shape[3]
    C_clamp = 0 if fresh_ops else C

    def q_map(b, r, j, layer_ref, lens_ref):
        return (b, r, 0)

    def fresh_map(b, r, j, layer_ref, lens_ref):
        return (b, 0, 0)

    def kv_map(b, r, j, layer_ref, lens_ref):
        last = jnp.maximum(lens_ref[b] + C_clamp - 1, 0) // block_s
        return (layer_ref[0], b, jnp.minimum(j, last), 0)

    def scale_map(b, r, j, layer_ref, lens_ref):
        last = jnp.maximum(lens_ref[b] + C_clamp - 1, 0) // block_s
        return (layer_ref[0], b, 0, jnp.minimum(j, last))

    in_specs = [
        pl.BlockSpec((1, block_r, Kq), q_map),
        pl.BlockSpec((1, 1, block_s, Kc), kv_map),
        pl.BlockSpec((1, 1, block_s, Kc), kv_map),
    ]
    if extras:
        Hkv = extras[0].shape[2]
        in_specs += [pl.BlockSpec((1, 1, Hkv, block_s), scale_map)] * 2
    if fresh_ops:
        in_specs += [pl.BlockSpec((1, C, Kc), fresh_map)] * 2
        if len(fresh_ops) == 4:
            Hkv = fresh_ops[2].shape[1]
            in_specs += [pl.BlockSpec((1, Hkv, C), fresh_map)] * 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_row_blocks, nblocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_r, Kq), q_map),
        scratch_shapes=[
            pltpu.VMEM((n_kv, block_r, 1), jnp.float32),
            pltpu.VMEM((n_kv, block_r, 1), jnp.float32),
            pltpu.VMEM((n_kv, block_r, scratch_hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, Kq), q.dtype),
        interpret=interpret,
    )(layer_arr, lens, q, k4, v4, *extras, *fresh_ops)


@functools.partial(jax.jit, static_argnames=("block_s", "block_r", "interpret"))
def flash_prefill_attend(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                         base_lens: jnp.ndarray, *, layer=None,
                         k_new=None, v_new=None,
                         block_s: int = 512, block_r: int = 512,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.attention.attend(causal=True) on the prefill path.

    q: [B, C, Hq, hd] (C-token chunk); k_cache/v_cache: [(L,) B, S, Hkv*hd]
    already containing the chunk at [base, base+C); base_lens: [B] int32.
    """
    B, C, Hq, hd = q.shape
    k4, layer_arr = _stack(k_cache, layer)
    v4, _ = _stack(v_cache, layer)
    K = k4.shape[3]
    Hkv = K // hd
    G = Hq // Hkv
    GT = G * C
    assert k4.shape[2] % block_s == 0, (k4.shape, block_s)
    block_r = min(block_r, GT)
    assert GT % block_r == 0, (GT, block_r)

    fresh = k_new is not None
    fresh_ops = ((k_new.reshape(B, C, K).astype(q.dtype),
                  v_new.reshape(B, C, K).astype(q.dtype)) if fresh else ())

    qg = _pack_q(q, Hkv, K)
    kernel = functools.partial(_prefill_kernel, C=C, block_r=block_r,
                               block_s=block_s, scale=1.0 / (hd ** 0.5),
                               n_kv=Hkv, hd=hd, fresh=fresh)
    out = _prefill_call(kernel, qg, k4, v4, layer_arr, base_lens, Kq=K, C=C,
                        block_r=block_r, block_s=block_s, scratch_hd=hd,
                        n_kv=Hkv, interpret=interpret, fresh_ops=fresh_ops)
    return _unpack_o(out, Hkv, G, C, hd)


@functools.partial(jax.jit, static_argnames=("block_s", "block_r", "interpret"))
def flash_prefill_attend_quant(q: jnp.ndarray, k_cache: jnp.ndarray,
                               k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                               v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                               layer=None, k_new=None, v_new=None,
                               ks_new=None, vs_new=None, block_s: int = 512,
                               block_r: int = 512,
                               interpret: bool = False) -> jnp.ndarray:
    """flash_prefill_attend over int8 caches with per-(token, head) scales
    (ops.kv_cache.quantize_kv_tokens layout: scales f32 [(L,) B, Hkv, S])."""
    B, C, Hq, hd = q.shape
    k4, layer_arr = _stack(k_cache, layer)
    v4, _ = _stack(v_cache, layer)
    ks4, _ = _stack(k_scale, layer)
    vs4, _ = _stack(v_scale, layer)
    K = k4.shape[3]
    Hkv = K // hd
    G = Hq // Hkv
    GT = G * C
    assert k4.shape[2] % block_s == 0, (k4.shape, block_s)
    block_r = min(block_r, GT)
    assert GT % block_r == 0, (GT, block_r)

    fresh = k_new is not None
    fresh_ops = ((k_new, v_new, ks_new, vs_new) if fresh else ())

    qg = _pack_q(q, Hkv, K)
    kernel = functools.partial(_prefill_quant_kernel, C=C, block_r=block_r,
                               block_s=block_s, scale=1.0 / (hd ** 0.5),
                               n_kv=Hkv, hd=hd, fresh=fresh)
    out = _prefill_call(kernel, qg, k4, v4, layer_arr, base_lens, Kq=K, C=C,
                        block_r=block_r, block_s=block_s, scratch_hd=hd,
                        n_kv=Hkv, interpret=interpret, extras=(ks4, vs4),
                        fresh_ops=fresh_ops)
    return _unpack_o(out, Hkv, G, C, hd)


@functools.partial(jax.jit, static_argnames=("block_s", "block_r", "interpret"))
def flash_prefill_attend_quant4(q: jnp.ndarray, k_cache: jnp.ndarray,
                                k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                                v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                                layer=None, k_new=None, v_new=None,
                                ks_new=None, vs_new=None, block_s: int = 512,
                                block_r: int = 512,
                                interpret: bool = False) -> jnp.ndarray:
    """flash_prefill_attend over int4 head-pair-packed caches
    (ops.kv_cache.quantize_kv_tokens_int4 layout; scales f32 [(L,) B, Hkv, S])."""
    B, C, Hq, hd = q.shape
    k4, layer_arr = _stack(k_cache, layer)
    v4, _ = _stack(v_cache, layer)
    ks4, _ = _stack(k_scale, layer)
    vs4, _ = _stack(v_scale, layer)
    Kp = k4.shape[3]
    Hkv = ks4.shape[2]
    assert Kp == (Hkv // 2) * hd and Hkv % 2 == 0, (Kp, Hkv, hd)
    K = Hkv * hd
    G = Hq // Hkv
    GT = G * C
    assert k4.shape[2] % block_s == 0, (k4.shape, block_s)
    block_r = min(block_r, GT)
    assert GT % block_r == 0, (GT, block_r)

    fresh = k_new is not None
    fresh_ops = ((k_new, v_new, ks_new, vs_new) if fresh else ())

    qg = _pack_q(q, Hkv, K)
    kernel = functools.partial(_prefill_quant4_kernel, C=C, block_r=block_r,
                               block_s=block_s, scale=1.0 / (hd ** 0.5),
                               n_kv=Hkv, hd=hd, fresh=fresh)
    out = _prefill_call(kernel, qg, k4, v4, layer_arr, base_lens, Kq=K, C=C,
                        block_r=block_r, block_s=block_s, scratch_hd=hd,
                        n_kv=Hkv, interpret=interpret, extras=(ks4, vs4),
                        fresh_ops=fresh_ops)
    return _unpack_o(out, Hkv, G, C, hd)
