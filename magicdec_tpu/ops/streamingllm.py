"""StreamingLLM sink+window draft cache: chunked prefill eviction + re-rope.

Behavioral port of reference ``KVCache.prefill_draft``
(Engine/StreamingLLM/model.py:115-157) and ``Attention.draft_prefill``
(:402-419): keys are stored *unrotated* while the prompt streams through in
C-token chunks; each chunk either appends (cache not yet at budget) or shifts
the window left by C keeping the 16-token attention sink; attention for the
chunk runs against a clone of the cache roped at *slot* positions with queries
roped at real-or-clamped positions.  After the last chunk the roped cache is
persisted so decode can append roped keys at slot positions.

The fixed-shape left-shift reproduces the reference's single stale slot at the
budget-crossing chunk exactly (budget ≡ 1 mod C ⇒ one zero-KV slot enters the
window and ages out), because both formulations slide a static window.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def stream_update_raw(dk: jnp.ndarray, dv: jnp.ndarray,
                      k_new: jnp.ndarray, v_new: jnp.ndarray,
                      fill: jnp.ndarray, *, budget: int, sink: int):
    """One chunk's raw-key cache update.

    dk/dv: [B, Sd, Hkv*hd] (slots [0, budget) in use during prefill);
    k_new/v_new: [B, C, Hkv, hd] un-roped; fill: scalar int32 = min(tokens so
    far, budget).  Returns (dk, dv, new_fill, vis) where vis = visible length
    for this chunk's attention.
    """
    B, C = k_new.shape[:2]
    k_new = k_new.reshape(B, C, -1)
    v_new = v_new.reshape(B, C, -1)

    def grow(args):
        dk, dv = args
        dk = jax.lax.dynamic_update_slice(dk, k_new.astype(dk.dtype), (0, fill, 0))
        dv = jax.lax.dynamic_update_slice(dv, v_new.astype(dv.dtype), (0, fill, 0))
        return dk, dv

    def evict(args):
        dk, dv = args
        win_k = jnp.concatenate([dk[:, sink + C: budget], k_new.astype(dk.dtype)], axis=1)
        win_v = jnp.concatenate([dv[:, sink + C: budget], v_new.astype(dv.dtype)], axis=1)
        dk = dk.at[:, sink:budget].set(win_k)
        dv = dv.at[:, sink:budget].set(win_v)
        return dk, dv

    growing = fill + C <= budget
    dk, dv = jax.lax.cond(growing, grow, evict, (dk, dv))
    new_fill = jnp.minimum(fill + C, budget)
    vis = jnp.minimum(fill + C, budget)
    return dk, dv, new_fill, vis


def slot_positions(budget: int) -> jnp.ndarray:
    return jnp.arange(budget, dtype=jnp.int32)
