"""KV cache primitives: fixed-shape, length-governed, functional.

Design: where the reference uses flashinfer paged-KV CSR tables with pages
statically owned per request (Engine/SnapKV/backend.py:270-287 — request *i*
owns pages ``[i*max_pages, (i+1)*max_pages)``, no dynamic allocator), the
TPU-native layout collapses that to a contiguous per-request region indexed by
an int32 length vector.  All "rollback" in speculative decoding is length
arithmetic (tests/SnapKV/selfspec_benchmark.py:164-181); slots past the length
are garbage and masked out of attention, exactly as in the reference.

Cache layout per layer: ``[B, H_kv, S_max, D]`` — contiguous (S, D) tiles per
(batch, head), the natural layout for a flash-style TPU decode kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def append_kv(k_cache: jnp.ndarray, v_cache: jnp.ndarray,
              k_new: jnp.ndarray, v_new: jnp.ndarray,
              write_pos: jnp.ndarray):
    """Append T new tokens per request at per-request positions.

    k_cache/v_cache: [B, H_kv, S, D];  k_new/v_new: [B, T, H_kv, D];
    write_pos: [B] int32 — the first slot to write for each request.
    Returns updated (k_cache, v_cache).

    Equivalent of flashinfer ``append_paged_kv_cache`` (Engine/utils.py:31-66)
    for the contiguous layout.  Implemented as a vmapped dynamic_update_slice,
    which XLA lowers to an in-place scatter when the caller donates the cache.
    """
    k_new = jnp.swapaxes(k_new, 1, 2).astype(k_cache.dtype)  # [B, H_kv, T, D]
    v_new = jnp.swapaxes(v_new, 1, 2).astype(v_cache.dtype)

    def _upd(cache_b, new_b, pos_b):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, pos_b, 0))

    k_cache = jax.vmap(_upd)(k_cache, k_new, write_pos)
    v_cache = jax.vmap(_upd)(v_cache, v_new, write_pos)
    return k_cache, v_cache


def gather_kv(k_cache: jnp.ndarray, v_cache: jnp.ndarray, indices: jnp.ndarray):
    """Gather per-(batch, kv-head) cache entries.

    k_cache/v_cache: [B, H_kv, S, D]; indices: [B, H_kv, N] int32.
    Returns (k, v) with shape [B, H_kv, N, D].  Used by SnapKV draft-cache
    construction (reference Engine/SnapKV/model.py:431-438 gathers top-k
    positions per kv head).
    """
    return (jnp.take_along_axis(k_cache, indices[..., None], axis=2),
            jnp.take_along_axis(v_cache, indices[..., None], axis=2))
