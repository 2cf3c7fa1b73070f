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
