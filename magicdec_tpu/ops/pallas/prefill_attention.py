"""Pallas TPU flash attention for chunked prefill.

Replacement for flashinfer's batch prefill path (reference
Engine/SnapKV/backend.py:231-287): a C-token query chunk attends the cache
prefix [0, base+C) with causal end-alignment.  Unlike decode (bandwidth-bound,
tiny q), prefill is MXU-bound, so the kernel blocks query rows as well as KV
columns and never materialises the [C, S] score matrix in HBM — the jnp oracle
path writes O(B·H·C·S) fp32 scores, which dominates prefill time at long
context.

Grid: (B, row_blocks, kv_blocks); kv innermost (sequential) so the online
softmax scratch for one row block is valid across its kv sweep.  KV heads are
folded into the kernel like decode_attention.  base_lens is scalar-prefetched;
kv blocks past base+C are clamp-deduped in the index map and skipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prefill_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref,
                    m_scr, l_scr, acc_scr, *, C: int, block_r: int,
                    block_s: int, scale: float, n_kv: int, hd: int):
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
    visible = col < base + row_t + 1
    # skip kv blocks no row of this block can see (rows see up to base+C-1)
    any_visible = start < base + C

    @pl.when(any_visible)
    def _compute():
        for h in range(n_kv):
            q = q_ref[0, :, h * hd:(h + 1) * hd]          # [BR, hd] bf16
            k = k_ref[0, :, h * hd:(h + 1) * hd]          # [BS, hd]
            v = v_ref[0, :, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(visible, s, NEG_INF)
            m_prev = m_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[h] = m_new

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _prefill_quant_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                          m_scr, l_scr, acc_scr, *, C: int, block_r: int,
                          block_s: int, scale: float, n_kv: int, hd: int):
    """int8-KV prefill: same structure as _prefill_kernel, with the
    per-(token, head) scales streamed as [1, n_kv, block_s] lane rows — the
    k scale multiplies score columns after the q.k dot, the v scale folds into
    p before the p.v dot (no dense dequantized cache is ever materialised;
    the previous fallback dequantized the FULL cache per chunk per layer)."""
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
    visible = col < base + row_t + 1
    any_visible = start < base + C

    @pl.when(any_visible)
    def _compute():
        for h in range(n_kv):
            q = q_ref[0, :, h * hd:(h + 1) * hd]
            k = k_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)
            v = v_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)
            ksc = ks_ref[0, h, :]
            vsc = vs_ref[0, h, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (ksc * scale)[None, :]
            s = jnp.where(visible, s, NEG_INF)
            m_prev = m_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
                (p * vsc[None, :]).astype(v.dtype), v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[h] = m_new

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _prefill_quant4_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                           m_scr, l_scr, acc_scr, *, C: int, block_r: int,
                           block_s: int, scale: float, n_kv: int, hd: int):
    """int4-KV prefill: head-pair-packed int8 KV blocks (quarter of bf16's
    bytes) unpacked to nibble planes once per block; otherwise identical to
    _prefill_quant_kernel.  See ops.pallas.decode_attention._unpack_int4_planes
    for the plane layout."""
    from magicdec_tpu.ops.pallas.decode_attention import _unpack_int4_planes

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
    visible = col < base + row_t + 1
    any_visible = start < base + C

    @pl.when(any_visible)
    def _compute():
        qdt = q_ref.dtype
        klo, khi = _unpack_int4_planes(k_ref[0], qdt)
        vlo, vhi = _unpack_int4_planes(v_ref[0], qdt)
        for h in range(n_kv):
            off = (h // 2) * hd
            k = (khi if h % 2 else klo)[:, off:off + hd]
            v = (vhi if h % 2 else vlo)[:, off:off + hd]
            q = q_ref[0, :, h * hd:(h + 1) * hd]
            ksc = ks_ref[0, h, :]
            vsc = vs_ref[0, h, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (ksc * scale)[None, :]
            s = jnp.where(visible, s, NEG_INF)
            m_prev = m_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
                (p * vsc[None, :]).astype(v.dtype), v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[h] = m_new

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "block_r", "interpret"))
def flash_prefill_attend_quant4(q: jnp.ndarray, k_cache: jnp.ndarray,
                                k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                                v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                                block_s: int = 512, block_r: int = 512,
                                interpret: bool = False) -> jnp.ndarray:
    """flash_prefill_attend over int4 head-pair-packed caches
    (ops.kv_cache.quantize_kv_tokens_int4 layout; scales f32 [B, Hkv, S])."""
    B, C, Hq, hd = q.shape
    S, Kp = k_cache.shape[1], k_cache.shape[2]
    Hkv = k_scale.shape[1]
    assert Kp == (Hkv // 2) * hd and Hkv % 2 == 0, (Kp, Hkv, hd)
    K = Hkv * hd
    G = Hq // Hkv
    GT = G * C
    assert S % block_s == 0, (S, block_s)
    block_r = min(block_r, GT)
    assert GT % block_r == 0, (GT, block_r)
    n_row_blocks = GT // block_r
    nblocks = S // block_s

    qg = (q.reshape(B, C, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
          .reshape(B, Hkv, GT, hd).transpose(0, 2, 1, 3).reshape(B, GT, K))
    lens = base_lens.astype(jnp.int32)

    def q_map(b, r, j, lens_ref):
        return (b, r, 0)

    def kv_map(b, r, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + C - 1, 0) // block_s
        return (b, jnp.minimum(j, last), 0)

    def scale_map(b, r, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + C - 1, 0) // block_s
        return (b, 0, jnp.minimum(j, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_row_blocks, nblocks),
        in_specs=[
            pl.BlockSpec((1, block_r, K), q_map),
            pl.BlockSpec((1, block_s, Kp), kv_map),
            pl.BlockSpec((1, block_s, Kp), kv_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
        ],
        out_specs=pl.BlockSpec((1, block_r, K), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, block_r, 1), jnp.float32),
            pltpu.VMEM((Hkv, block_r, 1), jnp.float32),
            pltpu.VMEM((Hkv, block_r, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_prefill_quant4_kernel, C=C, block_r=block_r,
                               block_s=block_s, scale=1.0 / (hd ** 0.5),
                               n_kv=Hkv, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, K), q.dtype),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache, k_scale, v_scale)

    return (out.reshape(B, GT, Hkv, hd).transpose(0, 2, 1, 3)
            .reshape(B, Hkv, G, C, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, C, Hq, hd))


@functools.partial(jax.jit, static_argnames=("block_s", "block_r", "interpret"))
def flash_prefill_attend_quant(q: jnp.ndarray, k_cache: jnp.ndarray,
                               k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                               v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                               block_s: int = 512, block_r: int = 512,
                               interpret: bool = False) -> jnp.ndarray:
    """flash_prefill_attend over int8 caches with per-(token, head) scales
    (ops.kv_cache.quantize_kv_tokens layout: scales f32 [B, Hkv, S])."""
    B, C, Hq, hd = q.shape
    S, K = k_cache.shape[1], k_cache.shape[2]
    Hkv = K // hd
    G = Hq // Hkv
    GT = G * C
    assert S % block_s == 0, (S, block_s)
    block_r = min(block_r, GT)
    assert GT % block_r == 0, (GT, block_r)
    n_row_blocks = GT // block_r
    nblocks = S // block_s

    qg = (q.reshape(B, C, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
          .reshape(B, Hkv, GT, hd).transpose(0, 2, 1, 3).reshape(B, GT, K))
    lens = base_lens.astype(jnp.int32)

    def q_map(b, r, j, lens_ref):
        return (b, r, 0)

    def kv_map(b, r, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + C - 1, 0) // block_s
        return (b, jnp.minimum(j, last), 0)

    def scale_map(b, r, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + C - 1, 0) // block_s
        return (b, 0, jnp.minimum(j, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_row_blocks, nblocks),
        in_specs=[
            pl.BlockSpec((1, block_r, K), q_map),
            pl.BlockSpec((1, block_s, K), kv_map),
            pl.BlockSpec((1, block_s, K), kv_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
        ],
        out_specs=pl.BlockSpec((1, block_r, K), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, block_r, 1), jnp.float32),
            pltpu.VMEM((Hkv, block_r, 1), jnp.float32),
            pltpu.VMEM((Hkv, block_r, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_prefill_quant_kernel, C=C, block_r=block_r,
                               block_s=block_s, scale=1.0 / (hd ** 0.5),
                               n_kv=Hkv, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, K), q.dtype),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache, k_scale, v_scale)

    return (out.reshape(B, GT, Hkv, hd).transpose(0, 2, 1, 3)
            .reshape(B, Hkv, G, C, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, C, Hq, hd))


@functools.partial(jax.jit, static_argnames=("block_s", "block_r", "interpret"))
def flash_prefill_attend(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                         base_lens: jnp.ndarray, *, block_s: int = 512,
                         block_r: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.attention.attend(causal=True) on the prefill path.

    q: [B, C, Hq, hd] (C-token chunk); k_cache/v_cache: [B, S, Hkv*hd]
    already containing the chunk at [base, base+C); base_lens: [B] int32.
    """
    B, C, Hq, hd = q.shape
    S, K = k_cache.shape[1], k_cache.shape[2]
    Hkv = K // hd
    G = Hq // Hkv
    GT = G * C
    assert S % block_s == 0, (S, block_s)
    block_r = min(block_r, GT)
    assert GT % block_r == 0, (GT, block_r)
    n_row_blocks = GT // block_r
    nblocks = S // block_s

    qg = (q.reshape(B, C, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
          .reshape(B, Hkv, GT, hd).transpose(0, 2, 1, 3).reshape(B, GT, K))
    lens = base_lens.astype(jnp.int32)

    def q_map(b, r, j, lens_ref):
        return (b, r, 0)

    def kv_map(b, r, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + C - 1, 0) // block_s
        return (b, jnp.minimum(j, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_row_blocks, nblocks),
        in_specs=[
            pl.BlockSpec((1, block_r, K), q_map),
            pl.BlockSpec((1, block_s, K), kv_map),
            pl.BlockSpec((1, block_s, K), kv_map),
        ],
        out_specs=pl.BlockSpec((1, block_r, K), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, block_r, 1), jnp.float32),
            pltpu.VMEM((Hkv, block_r, 1), jnp.float32),
            pltpu.VMEM((Hkv, block_r, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_prefill_kernel, C=C, block_r=block_r,
                               block_s=block_s, scale=1.0 / (hd ** 0.5),
                               n_kv=Hkv, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, K), q.dtype),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache)

    return (out.reshape(B, GT, Hkv, hd).transpose(0, 2, 1, 3)
            .reshape(B, Hkv, G, C, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, C, Hq, hd))
