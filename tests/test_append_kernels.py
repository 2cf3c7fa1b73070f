"""Aliased in-place pallas append kernels ≡ jnp scatter oracle (interpret
mode): per-array (append_rows_inplace / append_scale_rows_inplace) and the
merged all-arrays call (append_all_rows_inplace), ragged positions, boundary
blocks, T = 1 (decode) and T = 5 (verify window)."""

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.ops import kv_cache as kv


def _mk(L=2, B=3, S=64, Kc=256, T=5, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    cache = jnp.asarray(rng.randn(L, B, S, Kc), dtype)
    rows = jnp.asarray(rng.randn(L, B, T, Kc), dtype)
    pos = jnp.asarray([0, 7, S - T], jnp.int32)[:B]
    return cache, rows, pos


@pytest.mark.parametrize("T", [1, 5, 8])
def test_rows_inplace_matches_scatter(T):
    cache, rows, pos = _mk(T=T)
    ref = kv.append_rows_all_layers(cache, rows, pos)
    out = kv.append_rows_inplace(cache, rows, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize("T", [1, 5])
def test_merged_dense_matches_scatter(T):
    cache_k, rows_k, pos = _mk(T=T, seed=1)
    cache_v, rows_v, _ = _mk(T=T, seed=2)
    rk = kv.append_rows_all_layers(cache_k, rows_k, pos)
    rv = kv.append_rows_all_layers(cache_v, rows_v, pos)
    ok, ov = kv.append_all_rows_inplace(cache_k, cache_v, rows_k, rows_v, pos,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(ov))


@pytest.mark.parametrize("T", [1, 5])
def test_merged_quant_matches_scatter(T):
    L, B, S, Kc, H = 2, 3, 128, 256, 8
    rng = np.random.RandomState(3)
    ck = jnp.asarray(rng.randint(-127, 128, (L, B, S, Kc)), jnp.int8)
    cv = jnp.asarray(rng.randint(-127, 128, (L, B, S, Kc)), jnp.int8)
    rk = jnp.asarray(rng.randint(-127, 128, (L, B, T, Kc)), jnp.int8)
    rv = jnp.asarray(rng.randint(-127, 128, (L, B, T, Kc)), jnp.int8)
    sk = jnp.asarray(rng.rand(L, B, H, S), jnp.float32)
    sv = jnp.asarray(rng.rand(L, B, H, S), jnp.float32)
    srk = jnp.asarray(rng.rand(L, B, H, T), jnp.float32)
    srv = jnp.asarray(rng.rand(L, B, H, T), jnp.float32)
    pos = jnp.asarray([0, 13, S - T], jnp.int32)

    ref = (kv.append_rows_all_layers(ck, rk, pos),
           kv.append_rows_all_layers(cv, rv, pos),
           kv.append_scale_rows_all_layers(sk, srk, pos),
           kv.append_scale_rows_all_layers(sv, srv, pos))
    out = kv.append_all_rows_inplace(ck, cv, rk, rv, pos, sk, sv, srk, srv,
                                     interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_scale_inplace_matches_scatter():
    L, B, H, S, T = 2, 3, 8, 256, 5
    rng = np.random.RandomState(4)
    scale = jnp.asarray(rng.rand(L, B, H, S), jnp.float32)
    rows = jnp.asarray(rng.rand(L, B, H, T), jnp.float32)
    pos = jnp.asarray([0, 100, S - T], jnp.int32)
    ref = kv.append_scale_rows_all_layers(scale, rows, pos)
    out = kv.append_scale_rows_inplace(scale, rows, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
