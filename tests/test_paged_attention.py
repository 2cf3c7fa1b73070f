"""Paged pool kernels vs the contiguous oracle (interpret mode on CPU).

The paged decode/append kernels must be bit-equal to running the same
computation over the gathered contiguous cache — page indirection is a pure
layout change (SURVEY.md §2.9 paged attention; reference runs all decode
through flashinfer's paged wrappers)."""

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.ops import paged_kv as PKV
from magicdec_tpu.ops.attention import attend, attend_quant
from magicdec_tpu.ops.kv_cache import (
    pack_int4_heads, quantize_kv_tokens, quantize_kv_tokens_int4)
from magicdec_tpu.ops.pallas import paged_attention as PA


def _table(rng, B, npr, P):
    """Random page assignment: distinct pages per (request, logical block)."""
    perm = rng.permutation(P)[: B * npr]
    return jnp.asarray(perm.reshape(B, npr), jnp.int32)


def test_paged_decode_matches_contiguous_oracle():
    rng = np.random.RandomState(0)
    L, B, Hkv, G, hd, ps, npr, P = 2, 3, 2, 2, 64, 128, 3, 12
    K = Hkv * hd
    T = 4
    table = _table(rng, B, npr, P)
    pool_k = jnp.asarray(rng.randn(L, P, ps, K), jnp.float32)
    pool_v = jnp.asarray(rng.randn(L, P, ps, K), jnp.float32)
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    base = jnp.asarray([17, 200, npr * ps - T], jnp.int32)

    for layer in range(L):
        k = PKV.pool_gather(pool_k, table)[layer]
        v = PKV.pool_gather(pool_v, table)[layer]
        ref = attend(q, k, v, base, causal=True)
        out = PA.flash_paged_decode_attend(q, pool_k, pool_v, table, base,
                                           layer=layer, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_paged_decode_fresh_matches_appended():
    """fresh=True: window tokens ride as operands, cache visible < base."""
    rng = np.random.RandomState(1)
    L, B, Hkv, G, hd, ps, npr, P = 1, 2, 2, 2, 64, 128, 2, 8
    K = Hkv * hd
    T = 3
    table = _table(rng, B, npr, P)
    pool_k = jnp.asarray(rng.randn(L, P, ps, K), jnp.float32)
    pool_v = jnp.asarray(rng.randn(L, P, ps, K), jnp.float32)
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, T, K), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, T, K), jnp.float32)
    base = jnp.asarray([0, 100], jnp.int32)

    # oracle: append into the gathered cache, then attend
    k = PKV.pool_gather(pool_k, table)[0]
    v = PKV.pool_gather(pool_v, table)[0]
    def appended(c, new):
        out = c
        for b in range(B):
            out = out.at[b, base[b]:base[b] + T].set(new[b])
        return out
    ref = attend(q, appended(k, k_new), appended(v, v_new), base, causal=True)
    out = PA.flash_paged_decode_attend(q, pool_k, pool_v, table, base,
                                       layer=0, k_new=k_new, v_new=v_new,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bits", [8, 4])
def test_paged_decode_quant_matches_oracle(bits):
    rng = np.random.RandomState(2)
    L, B, Hkv, G, hd, ps, npr, P = 2, 2, 2, 2, 64, 128, 2, 8
    K = Hkv * hd
    T = 2
    table = _table(rng, B, npr, P)
    S = npr * ps
    quant = quantize_kv_tokens if bits == 8 else quantize_kv_tokens_int4
    import jax
    qv = jax.vmap(lambda xl: quant(xl.reshape(B, S, Hkv, hd)))
    kq, ks = qv(jnp.asarray(rng.randn(L, B, S, K), jnp.float32))
    vq, vs = qv(jnp.asarray(rng.randn(L, B, S, K), jnp.float32))
    # scatter the quantized contiguous caches into pools
    pool_k = PKV.pool_scatter(PKV.alloc_pool(L, P, ps, kq.shape[-1], kq.dtype),
                              table, kq)
    pool_v = PKV.pool_scatter(PKV.alloc_pool(L, P, ps, vq.shape[-1], vq.dtype),
                              table, vq)
    def to_scale_pool(s):
        # [L, B, H, S] -> pool [L, P, H, ps]
        segs = s.reshape(L, B, Hkv, npr, ps).transpose(1, 3, 0, 2, 4)
        pool = jnp.zeros((L, P, Hkv, ps), s.dtype)
        return pool.at[:, table.reshape(-1)].set(
            segs.reshape(B * npr, L, Hkv, ps).transpose(1, 0, 2, 3))
    sk_pool, sv_pool = to_scale_pool(ks), to_scale_pool(vs)
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    base = jnp.asarray([31, S - T], jnp.int32)

    fn = (PA.flash_paged_decode_attend_quant if bits == 8
          else PA.flash_paged_decode_attend_quant4)
    for layer in range(L):
        ref = attend_quant(q, kq[layer], ks[layer], vq[layer], vs[layer],
                           base, causal=True)
        out = fn(q, pool_k, sk_pool, pool_v, sv_pool, table, base,
                 layer=layer, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        # cross-check scale-pool gather round-trips
        np.testing.assert_array_equal(
            np.asarray(PKV.scale_pool_gather(sk_pool, table)), np.asarray(ks))


def test_paged_append_matches_contiguous():
    rng = np.random.RandomState(3)
    L, B, Hkv, hd, ps, npr, P = 3, 2, 2, 64, 128, 2, 8
    K = Hkv * hd
    T = 5
    table = _table(rng, B, npr, P)
    S = npr * ps
    pool_k = jnp.asarray(rng.randn(L, P, ps, K), jnp.bfloat16)
    pool_v = jnp.asarray(rng.randn(L, P, ps, K), jnp.bfloat16)
    rows_k = jnp.asarray(rng.randn(L, B, T, K), jnp.bfloat16)
    rows_v = jnp.asarray(rng.randn(L, B, T, K), jnp.bfloat16)
    pos = jnp.asarray([123, S - T], jnp.int32)

    ref_k = PKV.pool_gather(pool_k, table)
    ref_v = PKV.pool_gather(pool_v, table)
    for b in range(B):
        ref_k = ref_k.at[:, b, pos[b]:pos[b] + T].set(rows_k[:, b])
        ref_v = ref_v.at[:, b, pos[b]:pos[b] + T].set(rows_v[:, b])

    ok, ov = PA.append_paged_rows_inplace(pool_k, pool_v, rows_k, rows_v,
                                          pos, table, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(PKV.pool_gather(ok, table), np.float32),
        np.asarray(ref_k, np.float32))
    np.testing.assert_array_equal(
        np.asarray(PKV.pool_gather(ov, table), np.float32),
        np.asarray(ref_v, np.float32))
    # untouched pages keep their contents
    used = set(np.asarray(table).ravel().tolist())
    for p in range(P):
        if p not in used:
            np.testing.assert_array_equal(np.asarray(ok[:, p], np.float32),
                                          np.asarray(pool_k[:, p], np.float32))


def test_paged_append_quant_matches_contiguous():
    rng = np.random.RandomState(4)
    L, B, Hkv, hd, ps, npr, P = 2, 2, 2, 64, 128, 2, 6
    K = Hkv * hd
    T = 3
    table = _table(rng, B, npr, P)
    S = npr * ps
    pool_k = jnp.asarray(rng.randint(-127, 127, (L, P, ps, K)), jnp.int8)
    pool_v = jnp.asarray(rng.randint(-127, 127, (L, P, ps, K)), jnp.int8)
    sk = jnp.asarray(rng.rand(L, P, Hkv, ps), jnp.float32)
    sv = jnp.asarray(rng.rand(L, P, Hkv, ps), jnp.float32)
    rows_k = jnp.asarray(rng.randint(-127, 127, (L, B, T, K)), jnp.int8)
    rows_v = jnp.asarray(rng.randint(-127, 127, (L, B, T, K)), jnp.int8)
    srk = jnp.asarray(rng.rand(L, B, Hkv, T), jnp.float32)
    srv = jnp.asarray(rng.rand(L, B, Hkv, T), jnp.float32)
    pos = jnp.asarray([5, 130], jnp.int32)

    ref_k = PKV.pool_gather(pool_k, table)
    ref_sk = PKV.scale_pool_gather(sk, table)
    for b in range(B):
        ref_k = ref_k.at[:, b, pos[b]:pos[b] + T].set(rows_k[:, b])
        ref_sk = ref_sk.at[:, b, :, pos[b]:pos[b] + T].set(srk[:, b])

    ok, ov, osk, osv = PA.append_paged_rows_inplace(
        pool_k, pool_v, rows_k, rows_v, pos, table,
        scale_k=sk, scale_v=sv, srows_k=srk, srows_v=srv, interpret=True)
    np.testing.assert_array_equal(np.asarray(PKV.pool_gather(ok, table)),
                                  np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(PKV.scale_pool_gather(osk, table)),
                                  np.asarray(ref_sk))
