"""Unit tests for kernel-level ops against naive references (SURVEY.md §4:
the test pyramid the reference lacks).

Cache layout everywhere: [B, S, H_kv*hd] (folded head axis, ops/kv_cache.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from magicdec_tpu.ops.attention import attend
from magicdec_tpu.ops.kv_cache import append_kv, gather_kv, heads_view
from magicdec_tpu.ops.snapkv import _avg_pool_1d, snapkv_compress
from magicdec_tpu.ops.streamingllm import stream_update_raw


def test_append_kv_ragged_positions():
    rng = np.random.RandomState(0)
    B, H, S, D, T = 3, 2, 16, 4, 2
    k = jnp.zeros((B, S, H * D))
    v = jnp.zeros((B, S, H * D))
    kn = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    vn = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    pos = jnp.asarray([0, 5, 13], jnp.int32)
    k2, v2 = append_kv(k, v, kn, vn, pos)
    for b, p in enumerate([0, 5, 13]):
        np.testing.assert_allclose(np.asarray(k2[b, p:p + T]),
                                   np.asarray(kn[b]).reshape(T, H * D))
        np.testing.assert_allclose(np.asarray(v2[b, p:p + T]),
                                   np.asarray(vn[b]).reshape(T, H * D))
    # untouched elsewhere: total mass equals appended mass
    np.testing.assert_allclose(float(jnp.abs(k2).sum()), float(jnp.abs(kn).sum()),
                               rtol=1e-6)


def _naive_attend(q, k_folded, v_folded, base, causal=True):
    B, T, Hq, D = q.shape
    S = k_folded.shape[1]
    Hkv = k_folded.shape[2] // D
    G = Hq // Hkv
    k = np.asarray(k_folded).reshape(B, S, Hkv, D)
    v = np.asarray(v_folded).reshape(B, S, Hkv, D)
    out = np.zeros_like(np.asarray(q), dtype=np.float32)
    for b in range(B):
        for h in range(Hq):
            kh = k[b, :, h // G].astype(np.float32)
            vh = v[b, :, h // G].astype(np.float32)
            for t in range(T):
                lim = int(base[b]) + t + 1 if causal else int(base[b]) + T
                s = np.asarray(q[b, t, h], np.float32) @ kh[:lim].T / np.sqrt(D)
                p = np.exp(s - s.max())
                p = p / p.sum()
                out[b, t, h] = p @ vh[:lim]
    return out


def test_attend_matches_naive():
    rng = np.random.RandomState(1)
    B, T, Hq, Hkv, S, D = 2, 3, 4, 2, 12, 8
    q = jnp.asarray(rng.randn(B, T, Hq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
    base = jnp.asarray([4, 7], jnp.int32)
    out = attend(q, k, v, base)
    np.testing.assert_allclose(np.asarray(out), _naive_attend(q, k, v, base),
                               atol=1e-5, rtol=1e-5)


def test_avg_pool_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    x = rng.randn(3, 4, 21).astype(np.float32)
    ours = np.asarray(_avg_pool_1d(jnp.asarray(x), 5))
    ref = F.avg_pool1d(torch.from_numpy(x), kernel_size=5, padding=2,
                       stride=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_snapkv_compress_selects_heavy_hitters():
    """A key with massive attention mass from the window must be selected."""
    rng = np.random.RandomState(3)
    B, W, Hq, Hkv, D = 2, 8, 4, 2, 16
    ctx, budget = 40, 20
    q = jnp.asarray(rng.randn(B, W, Hq, D) * 0.1, jnp.float32)
    kh = rng.randn(B, 64, Hkv, D).astype(np.float32) * 0.1
    vh = rng.randn(B, 64, Hkv, D).astype(np.float32) * 0.1
    # make key 7 a heavy hitter for every query of kv-head 0 in batch 0
    kh[0, 7, 0] = np.asarray(q[0, :, 0].mean(0)) * 50
    k = jnp.asarray(kh.reshape(B, 64, Hkv * D))
    v = jnp.asarray(vh.reshape(B, 64, Hkv * D))
    dk, dv = snapkv_compress(q, k, v, ctx_len=ctx, window=W, budget=budget)
    assert dk.shape == (B, budget, Hkv, D)
    # key 7 of head 0 must appear among the selected (first budget-W) slots
    sel = np.asarray(dk[0, : budget - W, 0])
    target = kh[0, 7, 0]
    assert any(np.allclose(sel[i], target) for i in range(budget - W))
    # last W slots must be the window itself
    np.testing.assert_allclose(np.asarray(dk[0, budget - W:, 0]),
                               kh[0, ctx - W: ctx, 0])


def test_stream_update_grow_and_evict():
    rng = np.random.RandomState(4)
    B, H, D, C = 1, 1, 4, 8
    budget, sink = 17, 4  # budget ≡ 1 (mod C)
    Sd = budget + C
    dk = jnp.zeros((B, Sd, H * D))
    dv = jnp.zeros((B, Sd, H * D))
    chunks = [jnp.asarray(rng.randn(B, C, H, D), jnp.float32) for _ in range(4)]
    fill = jnp.zeros((), jnp.int32)
    for c in chunks:
        dk, dv, fill, vis = stream_update_raw(dk, dv, c, c, fill,
                                              budget=budget, sink=sink)
    # sink = tokens 0..3 (from chunk 0)
    np.testing.assert_allclose(np.asarray(dk[0, :sink]),
                               np.asarray(chunks[0][0, :sink]).reshape(sink, H * D))
    # final window ends with the last chunk
    np.testing.assert_allclose(np.asarray(dk[0, budget - C: budget]),
                               np.asarray(chunks[3][0]).reshape(C, H * D))
    assert int(fill) == budget


def test_gather_kv():
    rng = np.random.RandomState(5)
    B, S, H, D = 2, 10, 2, 4
    k = jnp.asarray(rng.randn(B, S, H * D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H * D), jnp.float32)
    idx = jnp.asarray(rng.randint(0, S, size=(B, H, 5)), jnp.int32)
    gk, gv = gather_kv(k, v, idx, H)
    kh = np.asarray(heads_view(k, H))  # [B, S, H, D]
    for b in range(B):
        for h in range(H):
            np.testing.assert_allclose(np.asarray(gk[b, h]),
                                       kh[b, np.asarray(idx[b, h]), h])
