"""Samplers (Engine/utils.py:68-179 capability parity)."""

import numpy as np

import jax
import jax.numpy as jnp

from magicdec_tpu.ops.sampling import (get_sampling_logits, sample,
                                       sampling_argmax_batch)


def test_top_p_keeps_nucleus_only():
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0, -5.0]])
    filtered = get_sampling_logits(logits, top_p=0.8, temperature=1.0)
    f = np.asarray(filtered)[0]
    # highest always kept, tail filtered to -inf
    assert np.isfinite(f[0])
    assert not np.isfinite(f[-1])
    # kept set = smallest prefix of sorted probs covering top_p
    probs = np.exp(np.asarray(logits)[0]) / np.exp(np.asarray(logits)[0]).sum()
    order = np.argsort(-probs)
    cum = np.cumsum(probs[order])
    kept = {order[0]} | {order[i] for i in range(1, 5) if cum[i - 1] < 0.8}
    assert {i for i in range(5) if np.isfinite(f[i])} == kept


def test_sample_respects_filter():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray([[10.0, 9.9, -20.0, -20.0]]).repeat(64, axis=0)
    keys = jax.random.split(rng, 64)
    toks = jax.vmap(lambda k, l: sample(k, l, top_p=0.99, temperature=1.0))(
        keys, logits[:, None])
    assert set(np.asarray(toks).ravel().tolist()) <= {0, 1}


def test_argmax_batch():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 3, 10))
    out = sampling_argmax_batch(logits)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.argmax(logits, -1)))
    assert out.dtype == jnp.int32
