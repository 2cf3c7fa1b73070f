"""Decode-state pytrees for the functional engine.

The reference scatters this state across mutable backend attributes and
driver-local variables that get hand-rolled-back every window
(Engine/SnapKV/backend.py:25-114, tests/SnapKV/selfspec_benchmark.py:164-181).
Here it is one immutable pytree threaded through jitted step functions, so the
whole speculation loop lives on-device.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class SpecState:
    """Dual-cache speculative decoding state (self-spec or standalone draft).

    Cache arrays are [L, B, H_kv, S, head_dim]; all lengths int32 [B].
    """

    k: jnp.ndarray            # target KV cache
    v: jnp.ndarray
    target_lens: jnp.ndarray  # visible target length (prefix + committed)
    dk: jnp.ndarray           # draft (compressed) KV cache
    dv: jnp.ndarray
    draft_fill: jnp.ndarray   # draft cache fill = append slot & causal base
    draft_pos: jnp.ndarray    # rope position base for the next draft token
                              # (SnapKV: real position == target_lens;
                              #  StreamingLLM: slot position == draft_fill)
    token0: jnp.ndarray       # [B] next window's committed slot-0 token
    output: jnp.ndarray       # [B, cap] generated tokens (slot 0 = first
                              # token produced by prefill)
    num_committed: jnp.ndarray  # [B] tokens written into `output`
    target_steps: jnp.ndarray   # scalar int32, number of verify calls
    done: jnp.ndarray           # scalar bool (batch-global, like reference)
    # StreamingLLM double-buffer carry (fixed shape; unused by SnapKV)
    db_tokens: Optional[jnp.ndarray] = None   # [B, 2]
    db_update: Optional[jnp.ndarray] = None   # [B] in {1, 2}
    # int8 target-cache scales [L, B, H_kv, S] (EngineConfig.kv_quant;
    # None for bf16 caches). ops.kv_cache.quantize_kv_tokens layout.
    ks: Optional[jnp.ndarray] = None
    vs: Optional[jnp.ndarray] = None
    # Gumbel-coupled sampling (EngineConfig.temperature > 0; None when greedy):
    # rng is the stream key, salt [B] the per-request noise-stream identity
    # (ops.sampling.coupled_gumbel).
    rng: Optional[jnp.ndarray] = None
    salt: Optional[jnp.ndarray] = None
    # Paged serving (engine/serving.PagedServingEngine): k/v (+ks/vs) are page
    # POOLS [L, P, ps, Kc] shared across slots and `table` [B, npr] int32 maps
    # a slot's logical KV blocks to pool pages.  None = contiguous caches.
    table: Optional[jnp.ndarray] = None


@flax.struct.dataclass
class BaselineState:
    """Autoregressive decode state (single full cache)."""

    k: jnp.ndarray
    v: jnp.ndarray
    lens: jnp.ndarray
    token0: jnp.ndarray
    output: jnp.ndarray
    num_committed: jnp.ndarray
    ks: Optional[jnp.ndarray] = None  # int8-cache scales, as in SpecState
    vs: Optional[jnp.ndarray] = None
    rng: Optional[jnp.ndarray] = None   # sampling key/salt, as in SpecState
    salt: Optional[jnp.ndarray] = None
