"""Pallas TPU flash-decode attention over the contiguous length-governed cache.

This is the TPU-native replacement for flashinfer's
``BatchPrefillWithPagedKVCacheWrapper`` decode/verify path (reference
Engine/SnapKV/backend.py:56-107): a small query window (T = 1 decode,
gamma+1 verify) attends over a long per-request KV prefix with causal
end-alignment, GQA, online (flash) softmax — without materialising the
[B, H, T, S] score tensor the jnp oracle (ops/attention.attend) creates.

Layout: caches are [B, S, H_kv*hd] (folded head axis, ops/kv_cache.py), so KV
blocks are [block_s, H_kv*hd] tiles with zero lane padding; queries are packed
the same way ([GT rows, H_kv*hd lanes], lanes h*hd:(h+1)*hd = head h).

Design:
- grid (B, S/block_s) iterated sequentially per TPU core; running max /
  normaliser / accumulator live in VMEM scratch across the S-block dimension;
  the per-head loop is unrolled inside the kernel.
- per-request lengths are scalar-prefetched; the K/V BlockSpec index maps
  clamp the block index to the last visible block, so blocks past a request's
  length are neither fetched (the pipeline dedups repeated indices) nor
  computed — the moral equivalent of flashinfer's ragged page tables, without
  host-side plan() calls.
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


def _decode_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref,
                   m_scr, l_scr, acc_scr, *, T: int, block_s: int, scale: float,
                   n_kv: int, hd: int):
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

    @pl.when(start < base + T)
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 0) % T
        visible = col < base + row_t + 1
        for h in range(n_kv):
            # bf16 into the MXU, fp32 accumulate
            q = q_ref[0, :, h * hd:(h + 1) * hd]          # [GT, hd]
            k = k_ref[0, :, h * hd:(h + 1) * hd]          # [BS, hd]
            v = v_ref[0, :, h * hd:(h + 1) * hd]          # [BS, hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(visible, s, NEG_INF)

            m_prev = m_scr[h]                             # [GT, 1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)                        # [GT, BS] fp32
            corr = jnp.exp(m_prev - m_new)                # [GT, 1]
            l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[h] = m_new

    @pl.when(j == nblocks - 1)
    def _finish():
        # per-head lane-slice writes (Mosaic rejects the transposed reshape)
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _decode_quant_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                         m_scr, l_scr, acc_scr, *, T: int, block_s: int,
                         scale: float, n_kv: int, hd: int):
    """int8-KV flash decode: KV blocks stream as int8 (half the HBM bytes of
    bf16 — the decode bottleneck at long context); per-(token, head) scales
    stream as [1, n_kv, block_s] f32 lane rows.  The k scale multiplies the
    score row after the q.k dot; the v scale multiplies p before the p.v dot —
    both lane-wise broadcasts, so no in-kernel transposes (Mosaic-safe).
    int8 -> bf16 casts are exact (|q| <= 127)."""
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

    @pl.when(start < base + T)
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 0) % T
        visible = col < base + row_t + 1
        for h in range(n_kv):
            q = q_ref[0, :, h * hd:(h + 1) * hd]                    # [GT, hd]
            k = k_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)    # [BS, hd]
            v = v_ref[0, :, h * hd:(h + 1) * hd].astype(q.dtype)
            ksc = ks_ref[0, h, :]                                    # [BS] f32
            vsc = vs_ref[0, h, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (ksc * scale)[None, :]
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

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


def _unpack_int4_planes(raw, dtype):
    """Packed int8 [R, Kp] -> (low, high) nibble planes [R, Kp] in `dtype`.

    Plane layout follows ops.kv_cache.pack_int4_heads: packed pseudo-head i
    lane l holds (head 2i, l) in the low nibble and (head 2i+1, l) in the
    high nibble.  Shifts run in int32 (sign-extension semantics are explicit
    and Mosaic-safe); int32 -> bf16 casts are exact for values in [-8, 7].
    """
    r = raw.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(r, 28), 28)
    hi = jnp.right_shift(r, 4)
    return lo.astype(dtype), hi.astype(dtype)


def _decode_quant4_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                          m_scr, l_scr, acc_scr, *, T: int, block_s: int,
                          scale: float, n_kv: int, hd: int):
    """int4-KV flash decode: KV blocks stream as head-pair-packed int8
    (ops.kv_cache.pack_int4_heads — a QUARTER of bf16's HBM bytes), unpacked
    to nibble planes once per block; head h reads lanes (h//2)*hd of the
    (h%2 ? high : low) plane.  Scales/masking/online softmax are identical to
    the int8 kernel."""
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

    @pl.when(start < base + T)
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 0) % T
        visible = col < base + row_t + 1
        qdt = q_ref.dtype
        klo, khi = _unpack_int4_planes(k_ref[0], qdt)        # [BS, Kp] each
        vlo, vhi = _unpack_int4_planes(v_ref[0], qdt)
        for h in range(n_kv):
            off = (h // 2) * hd
            k = (khi if h % 2 else klo)[:, off:off + hd]     # [BS, hd]
            v = (vhi if h % 2 else vlo)[:, off:off + hd]
            q = q_ref[0, :, h * hd:(h + 1) * hd]             # [GT, hd]
            ksc = ks_ref[0, h, :]                            # [BS] f32
            vsc = vs_ref[0, h, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (ksc * scale)[None, :]
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

    @pl.when(j == nblocks - 1)
    def _finish():
        for h in range(n_kv):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attend_quant4(q: jnp.ndarray, k_cache: jnp.ndarray,
                               k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                               v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                               block_s: int = 512,
                               interpret: bool = False) -> jnp.ndarray:
    """flash_decode_attend over int4 head-pair-packed caches.

    q: [B, T, Hq, hd]; k_cache/v_cache: packed int8 [B, S, (Hkv//2)*hd]
    (ops.kv_cache.quantize_kv_tokens_int4 layout); k_scale/v_scale: f32
    [B, Hkv, S]; base_lens: [B] int32.  Requires S % block_s == 0.
    """
    B, T, Hq, hd = q.shape
    S, Kp = k_cache.shape[1], k_cache.shape[2]
    Hkv = k_scale.shape[1]
    assert Kp == (Hkv // 2) * hd and Hkv % 2 == 0, (Kp, Hkv, hd)
    K = Hkv * hd
    G = Hq // Hkv
    GT = G * T
    assert S % block_s == 0, (S, block_s)
    nblocks = S // block_s

    qg = (q.reshape(B, T, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
          .reshape(B, Hkv, GT, hd).transpose(0, 2, 1, 3).reshape(B, GT, K))
    lens = base_lens.astype(jnp.int32)

    def q_map(b, j, lens_ref):
        return (b, 0, 0)

    def kv_map(b, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + T - 1, 0) // block_s
        return (b, jnp.minimum(j, last), 0)

    def scale_map(b, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + T - 1, 0) // block_s
        return (b, 0, jnp.minimum(j, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((1, GT, K), q_map),
            pl.BlockSpec((1, block_s, Kp), kv_map),
            pl.BlockSpec((1, block_s, Kp), kv_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
        ],
        out_specs=pl.BlockSpec((1, GT, K), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_decode_quant4_kernel, T=T, block_s=block_s,
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, K), q.dtype),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache, k_scale, v_scale)

    return (out.reshape(B, GT, Hkv, hd).transpose(0, 2, 1, 3)
            .reshape(B, Hkv, G, T, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, T, Hq, hd))


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attend_quant(q: jnp.ndarray, k_cache: jnp.ndarray,
                              k_scale: jnp.ndarray, v_cache: jnp.ndarray,
                              v_scale: jnp.ndarray, base_lens: jnp.ndarray, *,
                              block_s: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    """flash_decode_attend over int8 caches with per-(token, head) scales.

    q: [B, T, Hq, hd]; k_cache/v_cache: int8 [B, S, Hkv*hd];
    k_scale/v_scale: f32 [B, Hkv, S] (ops.kv_cache.quantize_kv_tokens layout);
    base_lens: [B] int32.  Requires S % block_s == 0.
    """
    B, T, Hq, hd = q.shape
    S, K = k_cache.shape[1], k_cache.shape[2]
    Hkv = K // hd
    G = Hq // Hkv
    GT = G * T
    assert S % block_s == 0, (S, block_s)
    nblocks = S // block_s

    qg = (q.reshape(B, T, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
          .reshape(B, Hkv, GT, hd).transpose(0, 2, 1, 3).reshape(B, GT, K))
    lens = base_lens.astype(jnp.int32)

    def q_map(b, j, lens_ref):
        return (b, 0, 0)

    def kv_map(b, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + T - 1, 0) // block_s
        return (b, jnp.minimum(j, last), 0)

    def scale_map(b, j, lens_ref):
        last = jnp.maximum(lens_ref[b] + T - 1, 0) // block_s
        return (b, 0, jnp.minimum(j, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((1, GT, K), q_map),
            pl.BlockSpec((1, block_s, K), kv_map),
            pl.BlockSpec((1, block_s, K), kv_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
            pl.BlockSpec((1, Hkv, block_s), scale_map),
        ],
        out_specs=pl.BlockSpec((1, GT, K), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_decode_quant_kernel, T=T, block_s=block_s,
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, K), q.dtype),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache, k_scale, v_scale)

    return (out.reshape(B, GT, Hkv, hd).transpose(0, 2, 1, 3)
            .reshape(B, Hkv, G, T, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, T, Hq, hd))


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attend(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                        base_lens: jnp.ndarray, *, block_s: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.attention.attend(causal=True) on the decode path.

    q: [B, T, Hq, hd]; k_cache/v_cache: [B, S, Hkv*hd]; base_lens: [B] int32.
    Requires S % block_s == 0.
    """
    B, T, Hq, hd = q.shape
    S, K = k_cache.shape[1], k_cache.shape[2]
    Hkv = K // hd
    G = Hq // Hkv
    GT = G * T
    assert S % block_s == 0, (S, block_s)
    nblocks = S // block_s

    # [B, T, Hkv, G, hd] -> [B, GT rows, Hkv*hd lanes] (rows group-major,
    # lanes head-major — parallel to the cache layout)
    qg = (q.reshape(B, T, Hkv, G, hd).transpose(0, 2, 3, 1, 4)  # B,Hkv,G,T,hd
          .reshape(B, Hkv, GT, hd).transpose(0, 2, 1, 3).reshape(B, GT, K))
    lens = base_lens.astype(jnp.int32)

    def q_map(b, j, lens_ref):
        return (b, 0, 0)

    def kv_map(b, j, lens_ref):
        # clamp to the last visible block: repeated indices are fetched once
        last = jnp.maximum(lens_ref[b] + T - 1, 0) // block_s
        return (b, jnp.minimum(j, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((1, GT, K), q_map),
            pl.BlockSpec((1, block_s, K), kv_map),
            pl.BlockSpec((1, block_s, K), kv_map),
        ],
        out_specs=pl.BlockSpec((1, GT, K), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_decode_kernel, T=T, block_s=block_s,
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, GT, K), q.dtype),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache)

    # [B, GT, Hkv, hd] -> [B, T, Hq, hd]
    return (out.reshape(B, GT, Hkv, hd).transpose(0, 2, 1, 3)   # B,Hkv,GT,hd
            .reshape(B, Hkv, G, T, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, T, Hq, hd))
