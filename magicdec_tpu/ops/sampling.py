"""Samplers (capability port of Engine/utils.py:68-179).

The reference ships top-p/temperature samplers plus CUDA-graphed argmax
batching, but all benchmarks decode greedily (SURVEY.md §2.2).  We provide the
same surface as pure functions — under jit they are "graph-captured" by
construction, no CUDA-graph machinery needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_sampling_logits(logits: jnp.ndarray, top_p: float, temperature: float) -> jnp.ndarray:
    """Temperature + nucleus filtering (reference utils.py:68-86): logits
    outside the top-p nucleus are set to -inf (filter value)."""
    logits = logits / jnp.maximum(temperature, 1e-5)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep the first)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < top_p], axis=-1)
    # threshold = smallest kept logit
    threshold = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
                        keepdims=True)
    return jnp.where(logits >= threshold, logits, -jnp.inf)


def sample(rng: jax.Array, logits: jnp.ndarray, top_p: float = 0.9,
           temperature: float = 0.6) -> jnp.ndarray:
    """Categorical sample from the top-p filtered distribution
    (reference utils.py:88-98)."""
    filtered = get_sampling_logits(logits, top_p, temperature)
    return jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)


def sampling_argmax_batch(logits: jnp.ndarray) -> jnp.ndarray:
    """Greedy batched argmax (reference utils.py:151-179, incl. its
    CUDA-graphed twin — jit replay subsumes graph capture)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def coupled_gumbel(key: jax.Array, salt: jnp.ndarray, idx: jnp.ndarray,
                   vocab: int) -> jnp.ndarray:
    """Per-(request, output-stream-position) Gumbel noise rows.

    salt [B] int32 (request identity), idx [B, T] int32 (absolute index of the
    candidate token in the output stream) -> f32 [B, T, vocab], deterministic
    in (key, salt, idx).  Draft and target perturb their logits with the SAME
    row at the same stream position, so argmax(logits/temp + g) turns exact
    speculative *sampling* into the greedy-match acceptance rule: every
    committed token is argmax(log target-probs + g_n) — an exact ancestral
    sample from the target distribution (Gumbel-max trick) no matter what the
    draft proposed.  The reference has no sampling spec-decode at all (its
    samplers, Engine/utils.py:88-149, are unused by every benchmark).

    Counter-based (threefry) generation keeps this bitwise identical under any
    GSPMD sharding; noise for positions that a window later rejects is simply
    regenerated identically the next time that position is proposed.
    """
    def one(s, n):
        k = jax.random.fold_in(jax.random.fold_in(key, s), n)
        return jax.random.gumbel(k, (vocab,), jnp.float32)

    return jax.vmap(jax.vmap(one, (None, 0)), (0, 0))(salt, idx)


def gumbel_sample_tokens(logits: jnp.ndarray, key: jax.Array,
                         salt: jnp.ndarray, idx: jnp.ndarray, *,
                         temperature: float, top_p: float = 1.0) -> jnp.ndarray:
    """argmax(filtered(logits)/temperature + coupled gumbel) -> int32 [B, T]."""
    logits = logits.astype(jnp.float32)
    if top_p < 1.0:
        logits = get_sampling_logits(logits, top_p, temperature)
    else:
        logits = logits / max(temperature, 1e-5)
    g = coupled_gumbel(key, salt, idx, logits.shape[-1])
    return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
