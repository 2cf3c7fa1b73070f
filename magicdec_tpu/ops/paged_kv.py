"""Paged KV cache in the TPU serving layout + ragged attention dispatch.

Layout: ``pages [L, P, page_size, 2*H_kv, head_dim]`` with k/v interleaved on
the combined-head axis (k at 2h, v at 2h+1) — the layout consumed by JAX's
in-tree ``ragged_paged_attention`` TPU kernel (the platform's flashinfer
counterpart, tuned per TPU generation).  Page assignment is static per
request — request *b* owns pages [b*ppr, (b+1)*ppr) — mirroring the
reference's allocator-free scheme (Engine/SnapKV/backend.py:270-287) while
keeping true page indirection for a future continuous-batching allocator.

Backends:
  - "rpa":  jax.experimental.pallas.ops.tpu.ragged_paged_attention (TPU only,
            head_dim >= 128 lane constraint)
  - "jnp":  vectorized oracle on the same paged layout (CPU tests, fallback)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from magicdec_tpu.ops import attention as attn_ops


def alloc_pages(n_layer: int, B: int, max_len: int, n_kv: int, head_dim: int,
                page_size: int = 128, dtype=jnp.bfloat16) -> jnp.ndarray:
    assert max_len % page_size == 0
    ppr = max_len // page_size
    return jnp.zeros((n_layer, B * ppr, page_size, 2 * n_kv, head_dim), dtype)


def pages_per_request(pages: jnp.ndarray, B: int) -> int:
    return pages.shape[1] // B


def append_paged(pages_l: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 fill: jnp.ndarray, *, B: int) -> jnp.ndarray:
    """Scatter T new tokens per request into the paged cache.

    pages_l: [P, ps, 2Hkv, hd]; k_new/v_new: [B, T, Hkv, hd]; fill: [B] int32.
    Equivalent of flashinfer append_paged_kv_cache (Engine/utils.py:31-66).
    """
    P, ps, _, hd = pages_l.shape
    ppr = P // B
    T = k_new.shape[1]
    pos = fill[:, None] + jnp.arange(T, dtype=jnp.int32)[None]       # [B, T]
    page = jnp.arange(B, dtype=jnp.int32)[:, None] * ppr + pos // ps
    slot = pos % ps
    # interleave k/v on the combined head axis: [B, T, Hkv, 2, hd] -> 2h / 2h+1
    kv = jnp.stack([k_new, v_new], axis=3).reshape(
        B, T, -1, hd).astype(pages_l.dtype)
    return pages_l.at[page, slot].set(kv)


def gather_contiguous(pages_l: jnp.ndarray, B: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paged -> contiguous [B, Hkv, S, hd] k/v views (test/oracle helper)."""
    P, ps, H2, hd = pages_l.shape
    ppr = P // B
    x = pages_l.reshape(B, ppr * ps, H2, hd)
    k = jnp.swapaxes(x[:, :, 0::2], 1, 2)
    v = jnp.swapaxes(x[:, :, 1::2], 1, 2)
    return k, v


def attend_paged(q: jnp.ndarray, pages_l: jnp.ndarray, base_lens: jnp.ndarray,
                 *, backend: str = "jnp") -> jnp.ndarray:
    """Causal (end-aligned) ragged attention over the paged cache.

    q: [B, T, Hq, hd]; pages_l already contains the T new tokens.
    base_lens: visible length before the T new tokens (oracle semantics of
    ops.attention.attend).
    """
    B, T, Hq, hd = q.shape
    if backend == "jnp":
        k, v = gather_contiguous(pages_l, B)
        return attn_ops.attend(q, k, v, base_lens, causal=True)
    if backend == "rpa":
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention)

        P = pages_l.shape[0]
        ppr = P // B
        kv_lens = (base_lens + T).astype(jnp.int32)
        page_indices = jnp.arange(P, dtype=jnp.int32).reshape(B, ppr)
        cu_q_lens = (jnp.arange(B + 1, dtype=jnp.int32)) * T
        num_seqs = jnp.asarray([B], jnp.int32)
        out = ragged_paged_attention(
            q.reshape(B * T, Hq, hd), pages_l, kv_lens, page_indices,
            cu_q_lens, num_seqs, sm_scale=float(hd) ** -0.5)
        return out.reshape(B, T, Hq, hd)
    raise ValueError(backend)


# ---------------------------------------------------------------------------
# Serving page POOL (framework-native layout): pools [L, P, ps, Hkv*hd] with
# per-request page tables [B, npr].  This is the layout consumed by the
# Pallas paged kernels (ops/pallas/paged_attention.py) and the
# continuous-batching paged serving engine; pages are assigned by the native
# host-side allocator (native/runtime.cpp PageAllocator) at admission-wave
# boundaries — vs the reference's flashinfer paged wrappers re-planned on the
# host every decode step (Engine/SnapKV/backend.py:181-197).
# ---------------------------------------------------------------------------

def alloc_pool(n_layer: int, n_pages: int, page_size: int, lane_width: int,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """[L, P, ps, Kc] page pool (Kc = Hkv*hd dense, (Hkv//2)*hd int4-packed)."""
    return jnp.zeros((n_layer, n_pages, page_size, lane_width), dtype)


def alloc_scale_pool(n_layer: int, n_pages: int, n_kv: int, page_size: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[L, P, Hkv, ps] per-(token, head) scale pool for quantized pools."""
    return jnp.zeros((n_layer, n_pages, n_kv, page_size), dtype)


def pool_gather(pool: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Paged -> contiguous oracle view: [L, P, ps, Kc] + [B, npr] ->
    [L, B, npr*ps, Kc] (tests / jnp fallback; a real gather, never on the
    hot path)."""
    L, _, ps, Kc = pool.shape
    B, npr = table.shape
    return pool[:, table.reshape(-1)].reshape(L, B, npr * ps, Kc)


def scale_pool_gather(pool: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """[L, P, H, ps] + [B, npr] -> [L, B, H, npr*ps]."""
    L, _, H, ps = pool.shape
    B, npr = table.shape
    g = pool[:, table.reshape(-1)].reshape(L, B, npr, H, ps)
    return jnp.swapaxes(g, 2, 3).reshape(L, B, H, npr * ps)


def pool_scatter(pool: jnp.ndarray, table: jnp.ndarray,
                 contiguous: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pool_gather (test helper): write [L, B, npr*ps, Kc] back
    into pool pages."""
    L, _, ps, Kc = pool.shape
    B, npr = table.shape
    rows = contiguous.reshape(L, B * npr, ps, Kc)
    return pool.at[:, table.reshape(-1)].set(rows)


def append_paged_rows_all_layers(pool: jnp.ndarray, rows: jnp.ndarray,
                                 write_pos: jnp.ndarray,
                                 table: jnp.ndarray) -> jnp.ndarray:
    """jnp oracle of the aliased paged append (ops/pallas/paged_attention.
    append_paged_rows_inplace): scatter rows [L, B, T, Kc] into pool pages at
    per-request logical positions.  CPU tests / fallback only — a jnp scatter
    on the pool forces a defensive full-pool copy under jit."""
    L, P, ps, Kc = pool.shape
    B, npr = table.shape
    T = rows.shape[2]
    pos = write_pos[:, None].astype(jnp.int32) + jnp.arange(T, dtype=jnp.int32)[None]
    page = jnp.take_along_axis(table, pos // ps, axis=1)         # [B, T]
    slot = pos % ps
    return pool.at[:, page, slot].set(rows.astype(pool.dtype))


def append_paged_scale_rows_all_layers(spool: jnp.ndarray, srows: jnp.ndarray,
                                       write_pos: jnp.ndarray,
                                       table: jnp.ndarray) -> jnp.ndarray:
    """Scale counterpart: spool [L, P, H, ps]; srows [L, B, H, T]."""
    L, P, H, ps = spool.shape
    B, npr = table.shape
    T = srows.shape[3]
    pos = write_pos[:, None].astype(jnp.int32) + jnp.arange(T, dtype=jnp.int32)[None]
    page = jnp.take_along_axis(table, pos // ps, axis=1)         # [B, T]
    slot = pos % ps
    h = jnp.arange(H, dtype=jnp.int32)
    # advanced indices (page, h, slot) broadcast to [B, T, H]; result axes
    # [L, B, T, H] <- srows moved to [L, B, T, H]
    return spool.at[:, page[:, :, None], h[None, None, :],
                    slot[:, :, None]].set(
        jnp.moveaxis(srows, 3, 2).astype(spool.dtype))
