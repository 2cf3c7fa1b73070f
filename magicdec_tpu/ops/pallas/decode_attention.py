"""Pallas TPU flash-decode attention over the contiguous length-governed cache.

This is the TPU-native replacement for flashinfer's
``BatchPrefillWithPagedKVCacheWrapper`` decode/verify path (reference
Engine/SnapKV/backend.py:56-107): a small query window (T = 1 decode,
gamma+1 verify) attends over a long per-request KV prefix with causal
end-alignment, GQA, online (flash) softmax — without materialising the
[B, H, T, S] score tensor the jnp oracle (ops/attention.attend) creates.

Design:
- grid (B, H_kv, S/BS) iterated sequentially per TPU core; running max /
  normaliser / accumulator live in VMEM scratch across the S-block dimension.
- per-request lengths are scalar-prefetched; the K/V BlockSpec index maps
  clamp the block index to the last visible block, so blocks past a request's
  length are neither fetched (the pipeline dedups repeated indices) nor
  computed (guarded with @pl.when)  — the moral equivalent of flashinfer's
  ragged page tables, without host-side plan() calls.
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
                   n_kv: int):
    """grid (B, S/block_s); the KV-head loop is unrolled inside the kernel so
    each grid step moves n_kv * 2 * block_s * hd bytes — big enough that DMA,
    not per-step pipeline overhead, sets the pace."""
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
    GT = q_ref.shape[2]

    @pl.when(start < base + T)
    def _compute():
        col = start + jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (GT, block_s), 0) % T
        visible = col < base + row_t + 1
        for h in range(n_kv):
            # keep native dtype into the MXU (bf16 inputs, fp32 accumulate);
            # casting to fp32 first would quadruple the MXU passes
            q = q_ref[0, h]                               # [GT, hd]
            k = k_ref[0, h]                               # [BS, hd]
            v = v_ref[0, h]                               # [BS, hd]
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
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_attend(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                        base_lens: jnp.ndarray, *, block_s: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.attention.attend(causal=True) on the decode path.

    q: [B, T, Hq, hd]; k_cache/v_cache: [B, Hkv, S, hd]; base_lens: [B] int32.
    Requires S % block_s == 0 (caches are allocated in 128-multiples).
    """
    B, T, Hq, hd = q.shape
    Hkv, S = k_cache.shape[1], k_cache.shape[2]
    G = Hq // Hkv
    GT = G * T
    assert S % block_s == 0, (S, block_s)
    nblocks = S // block_s

    # [B, T, Hkv, G, hd] -> [B, Hkv, G*T, hd] (group-major rows, t minor)
    qg = q.reshape(B, T, Hkv, G, hd).transpose(0, 2, 3, 1, 4).reshape(B, Hkv, GT, hd)
    lens = base_lens.astype(jnp.int32)

    def q_map(b, j, lens_ref):
        return (b, 0, 0, 0)

    def kv_map(b, j, lens_ref):
        # clamp to the last visible block: repeated indices are fetched once
        last = jnp.maximum(lens_ref[b] + T - 1, 0) // block_s
        return (b, 0, jnp.minimum(j, last), 0)

    def o_map(b, j, lens_ref):
        return (b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((1, Hkv, GT, hd), q_map),
            pl.BlockSpec((1, Hkv, block_s, hd), kv_map),
            pl.BlockSpec((1, Hkv, block_s, hd), kv_map),
        ],
        out_specs=pl.BlockSpec((1, Hkv, GT, hd), o_map),
        scratch_shapes=[
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, 1), jnp.float32),
            pltpu.VMEM((Hkv, GT, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_decode_kernel, T=T, block_s=block_s,
                               scale=1.0 / (hd ** 0.5), n_kv=Hkv)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GT, hd), q.dtype),
        interpret=interpret,
    )(lens, qg, k_cache, v_cache)

    # [B, Hkv, G, T, hd] -> [B, T, Hq, hd]
    return out.reshape(B, Hkv, G, T, hd).transpose(0, 3, 1, 2, 4).reshape(B, T, Hq, hd)
