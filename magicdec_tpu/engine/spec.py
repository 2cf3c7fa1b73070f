"""Vectorized greedy acceptance for speculative decoding (on-device).

Port of the driver-side verify loop (tests/SnapKV/selfspec_benchmark.py:145-211)
as pure tensor math, so it runs inside the jitted window step instead of on the
host.  Greedy contract: token i of the draft window is accepted iff it equals
the target's argmax at the same position and is not an end-of-text token;
acceptance is prefix-closed (cumprod).  The bonus token is the target's argmax
at the first rejected position.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def is_eot(tokens: jnp.ndarray, eot_ids: jnp.ndarray) -> jnp.ndarray:
    """tokens [...] int32, eot_ids [E] int32 -> bool mask."""
    return (tokens[..., None] == eot_ids).any(-1)


def greedy_accept(target_tokens: jnp.ndarray, tokens_buffer: jnp.ndarray,
                  eot_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """target_tokens [B, gamma+1] (verify argmax), tokens_buffer [B, gamma+1]
    (slot 0 committed, 1..gamma drafted).

    Returns (accept_nums [B] in [1, gamma+1], bonus [B], eot_accepted [B]
    bool — per request, so serving can terminate slots independently; the
    fixed-batch engine reduces it with .any()).  Matches reference :146-176
    including the EOT handling: a drafted EOT is never accepted, but stops
    generation iff every token before it was.
    """
    gamma = tokens_buffer.shape[1] - 1
    draft = tokens_buffer[:, 1:]
    match = target_tokens[:, :gamma] == draft
    eot = is_eot(draft, eot_ids)
    acc = jnp.cumprod((match & ~eot).astype(jnp.int32), axis=1)
    accept_nums = acc.sum(axis=1) + 1
    eot_accepted = jnp.any(eot & acc.astype(bool), axis=1)
    bonus = jnp.take_along_axis(target_tokens, (accept_nums - 1)[:, None], axis=1)[:, 0]
    return accept_nums.astype(jnp.int32), bonus, eot_accepted


def commit_tokens(output: jnp.ndarray, num_committed: jnp.ndarray,
                  tokens_buffer: jnp.ndarray, accept_nums: jnp.ndarray) -> jnp.ndarray:
    """Scatter the accepted window into the output buffer.

    output [B, cap]; num_committed [B] = write offset; tokens_buffer
    [B, gamma+1]; accept_nums [B].  Equivalent of the mask-scatter at
    reference :183-187 with fixed shapes.
    """
    cap = output.shape[1]
    gamma1 = tokens_buffer.shape[1]
    pos = jnp.arange(cap, dtype=jnp.int32)[None]
    win_idx = pos - num_committed[:, None]
    take = (win_idx >= 0) & (win_idx < accept_nums[:, None])
    gathered = jnp.take_along_axis(tokens_buffer,
                                   jnp.clip(win_idx, 0, gamma1 - 1), axis=1)
    return jnp.where(take, gathered, output)


def write_at(output: jnp.ndarray, index: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    """output[b, index[b]] = value[b] (fixed-shape one-hot write)."""
    cap = output.shape[1]
    pos = jnp.arange(cap, dtype=jnp.int32)[None]
    return jnp.where(pos == index[:, None], value[:, None], output)
