"""Determinism helpers (reference Engine/utils.py:189-194 ``setup_seed``)."""

from __future__ import annotations

import random

import numpy as np

import jax


def setup_seed(seed: int) -> jax.Array:
    """Seed numpy + python RNGs and return a jax PRNG key.  JAX/XLA:TPU is
    deterministic given fixed keys, so there is no cudnn.deterministic
    equivalent to set."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
