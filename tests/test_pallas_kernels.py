"""Pallas kernel vs jnp-oracle parity (interpret mode on CPU; the same kernels
compile natively on TPU — SURVEY.md §7 kernel plan)."""

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.ops.attention import attend
from magicdec_tpu.ops.pallas.decode_attention import flash_decode_attend


@pytest.mark.parametrize("T,G,hd,block_s", [
    (1, 4, 64, 64),    # plain decode
    (4, 4, 64, 64),    # verify window
    (2, 1, 128, 128),  # MHA, big head
    (1, 4, 64, 256),   # single whole-cache block (_pick_block_s S-path)
    (4, 4, 64, 256),
])
def test_flash_decode_matches_oracle(T, G, hd, block_s):
    rng = np.random.RandomState(0)
    B, Hkv, S = 3, 2, 256
    Hq = Hkv * G
    q = jnp.asarray(rng.randn(B, T, Hq, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([17, 100, 256 - T], jnp.int32)

    ref = attend(q, k, v, base, causal=True)
    out = flash_decode_attend(q, k, v, base, block_s=block_s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_ignores_garbage_beyond_length():
    """Slots past base+T must not affect output (rollback correctness)."""
    rng = np.random.RandomState(1)
    B, Hkv, G, T, S, hd = 2, 2, 2, 2, 128, 64
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([5, 64], jnp.int32)
    out1 = flash_decode_attend(q, k, v, base, block_s=64, interpret=True)
    k2 = k.at[:, 70:].set(1e4)
    v2 = v.at[:, 70:].set(-1e4)
    out2 = flash_decode_attend(q, k2, v2, base, block_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-6)
    # request 1: base=64 -> tokens at 64,65 visible; 70+ still masked
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]),
                               atol=1e-6)


def test_flash_decode_bf16():
    rng = np.random.RandomState(2)
    B, Hkv, G, T, S, hd = 2, 2, 4, 4, 256, 64
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.bfloat16)
    base = jnp.asarray([30, 200], jnp.int32)
    ref = attend(q, k, v, base, causal=True)
    out = flash_decode_attend(q, k, v, base, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2)


def test_flash_prefill_matches_oracle():
    from magicdec_tpu.ops.pallas.prefill_attention import flash_prefill_attend

    rng = np.random.RandomState(3)
    B, Hkv, G, hd, S, C = 2, 2, 4, 32, 256, 64
    q = jnp.asarray(rng.randn(B, C, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([64, 128], jnp.int32)
    ref = attend(q, k, v, base, causal=True)
    out = flash_prefill_attend(q, k, v, base, block_s=64, block_r=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_prefill_dispatch_ragged_remainder_chunk():
    """G*T=896 passes the %128 dispatch guard but 512 does not divide it:
    the block_r pick must fall back to a true divisor (ragged admission
    remainder chunks crashed the kernel contract on hardware)."""
    from magicdec_tpu.ops.attention import _pick_block_r, attend_auto

    # 896 = 128*7: the only 128-multiple divisor <= 512 is 128 itself
    assert _pick_block_r(896) == 128
    assert _pick_block_r(512) == 512
    assert _pick_block_r(768) == 384
    assert _pick_block_r(128) == 128
    rng = np.random.RandomState(11)
    B, Hkv, G, hd, S, T = 1, 2, 4, 32, 512, 224   # G*T = 896
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([128], jnp.int32)
    ref = attend(q, k, v, base, causal=True)
    out = attend_auto(q, k, v, base, backend="flash")  # interpret on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


class TestQuantMatmulKernel:
    def _mk(self, bits, group, In=128, Out=64, M=4, seed=5):
        from magicdec_tpu import quantization as Q

        rng = np.random.RandomState(seed)
        w = jnp.asarray(rng.randn(In, Out).astype(np.float32))
        x = jnp.asarray(rng.randn(M, In).astype(np.float32))
        wq = Q.quantize_weight(w, bits=bits, group_size=group)
        ref = Q.quant_matmul(x, wq)
        return x, wq, ref

    @pytest.mark.parametrize("bits,group", [(8, None), (8, 32), (4, 32), (4, 64)])
    def test_matches_jnp_path(self, bits, group):
        from magicdec_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

        x, wq, ref = self._mk(bits, group)
        out = quant_matmul_pallas(x, wq.q, wq.scale, bits=bits,
                                  group_size=wq.group_size, block_in=64,
                                  block_out=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    @pytest.mark.parametrize("bits,group", [(8, None), (8, 32)])
    def test_fused_norm_matches_norm_then_matmul(self, bits, group):
        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops.pallas.quant_matmul import quant_matmul_fused_pallas

        x, wq, _ = self._mk(bits, group)
        nw = jnp.asarray(np.random.RandomState(9).rand(x.shape[1])
                         .astype(np.float32) + 0.5)
        ref = Q.quant_matmul(Q._rms_norm(x, nw, 1e-5), wq)
        out = quant_matmul_fused_pallas(
            x, wq.q, wq.scale, nw, bits=bits, group_size=wq.group_size,
            block_in=x.shape[1], block_out=64, norm=True, norm_eps=1e-5,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    @pytest.mark.parametrize("bits,group", [(8, None), (8, 32), (4, 32)])
    def test_fused_gate_matches_silu_gate(self, bits, group):
        """w13 gate|up fusion: silu(x@w[:, :F]) * (x@w[:, F:])."""
        import jax

        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops.pallas.quant_matmul import quant_matmul_fused_pallas

        x, wq, y = self._mk(bits, group)
        F = y.shape[-1] // 2
        ref = jax.nn.silu(y[..., :F]) * y[..., F:]
        out = quant_matmul_fused_pallas(
            x, wq.q, wq.scale, bits=bits, group_size=wq.group_size,
            block_in=64, block_out=64, gate=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    @pytest.mark.parametrize("bits,group", [(8, None), (8, 32), (4, 32)])
    def test_fused_residual_matches_add(self, bits, group):
        """quant_matmul(residual=) epilogue == res + plain quant dot."""
        from magicdec_tpu.ops.pallas.quant_matmul import quant_matmul_fused_pallas

        x, wq, y = self._mk(bits, group)
        res = jnp.asarray(np.random.RandomState(7)
                          .randn(*y.shape).astype(np.float32))
        ref = res + y
        out = quant_matmul_fused_pallas(
            x, wq.q, wq.scale, None, res, bits=bits,
            group_size=wq.group_size, block_in=64, block_out=64,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_quant_mlp_matches_two_call_path(self):
        """quant_mlp_pallas (norm -> silu-gated MLP -> w2 + residual in ONE
        call) == the jnp norm/gate/matmul composition."""
        import jax

        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops.pallas.quant_matmul import quant_mlp_pallas

        rng = np.random.RandomState(21)
        D, F, M = 256, 512, 8
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        res = jnp.asarray(rng.randn(M, D).astype(np.float32))
        nw = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        w13 = Q.quantize_weight(jnp.asarray(rng.randn(D, 2 * F), jnp.float32),
                                bits=8)
        w2 = Q.quantize_weight(jnp.asarray(rng.randn(F, D), jnp.float32),
                               bits=8)
        gu = Q.quant_matmul(Q._rms_norm(x, nw, 1e-5), w13)
        gated = jax.nn.silu(gu[..., :F]) * gu[..., F:]
        ref = res + Q.quant_matmul(gated, w2)
        out = quant_mlp_pallas(x, w13.q, w13.scale, w2.q, w2.scale, nw, res,
                               block_f=128, norm_eps=1e-5, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)
        # no-residual variant
        out2 = quant_mlp_pallas(x, w13.q, w13.scale, w2.q, w2.scale, nw,
                                block_f=128, norm_eps=1e-5, interpret=True)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref - res),
                                   atol=2e-3, rtol=2e-3)

    def test_dense_fused_matmul_matches_jnp(self):
        """dense_matmul_fused_pallas (bf16 weight streaming + fused norm /
        residual — the round-5 dense-target lever, unwired) == jnp chain."""
        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops.pallas.quant_matmul import dense_matmul_fused_pallas

        rng = np.random.RandomState(41)
        In, Out, M = 128, 128, 8
        x = jnp.asarray(rng.randn(M, In).astype(np.float32))
        w = jnp.asarray(rng.randn(In, Out).astype(np.float32))
        nw = jnp.asarray(rng.rand(In).astype(np.float32) + 0.5)
        res = jnp.asarray(rng.randn(M, Out).astype(np.float32))
        ref = res + Q._rms_norm(x, nw, 1e-5) @ w
        out = dense_matmul_fused_pallas(x, w, nw, res, block_out=64,
                                        norm=True, norm_eps=1e-5,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)
        # plain (no norm/residual) multi-in-block path
        out2 = dense_matmul_fused_pallas(x, w, block_in=64, block_out=64,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(x @ w),
                                   atol=2e-3, rtol=2e-3)

    def test_dense_mlp_matches_jnp_chain(self):
        """dense_mlp_pallas (whole DENSE FFN — norm -> gate|up -> SiLU ->
        w2 -> +res — in one call; the round-5 wired dense-target lever) ==
        the jnp chain, with and without residual."""
        import jax

        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops.pallas.quant_matmul import dense_mlp_pallas

        rng = np.random.RandomState(51)
        D, F, M = 256, 512, 8
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        res = jnp.asarray(rng.randn(M, D).astype(np.float32))
        nw = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        w13 = jnp.asarray(rng.randn(D, 2 * F).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng.randn(F, D).astype(np.float32) * 0.05)
        gu = Q._rms_norm(x, nw, 1e-5) @ w13
        gated = jax.nn.silu(gu[:, :F]) * gu[:, F:]
        ref = res + gated @ w2
        out = dense_mlp_pallas(x, w13, w2, nw, res, block_f=128,
                               norm_eps=1e-5, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)
        out2 = dense_mlp_pallas(x, w13, w2, nw, block_f=128, norm_eps=1e-5,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref - res),
                                   atol=2e-3, rtol=2e-3)

    def test_dense_dispatch_rows_hint_m_invariant(self):
        """The decode-rows routing contract (config.py ModelConfig
        .decode_rows): with the SAME rows_hint, a row produces bit-identical
        output whether it rides an M=B call (baseline) or an
        M=B*(gamma+1) call (verify) — for hints on BOTH sides of the
        kernel/jnp routing boundary."""
        from magicdec_tpu import quantization as Q

        rng = np.random.RandomState(52)
        D, Out = 512, 512  # In % 512 == 0 so the quant kernel can engage
        w = jnp.asarray(rng.randn(D, Out).astype(np.float32) * 0.05)
        nw = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        big = jnp.asarray(rng.randn(16, D).astype(np.float32))
        small = big[:4]
        old = Q._MATMUL_BACKEND
        Q.set_matmul_backend("pallas")
        Q.set_dense_kernels(True)
        try:
            for hint in (16, 600):  # 16 -> kernel engages; 600 -> jnp (both)
                yb = Q.dense_matmul(big, w, norm=(nw, 1e-5), rows_hint=hint)
                ys = Q.dense_matmul(small, w, norm=(nw, 1e-5), rows_hint=hint)
                np.testing.assert_array_equal(np.asarray(yb)[:4],
                                              np.asarray(ys))
                wq = Q.quantize_weight(w, bits=8)
                qb = Q.quant_matmul(big.astype(jnp.float32), wq,
                                    norm=(nw, 1e-5), rows_hint=hint)
                qs = Q.quant_matmul(small.astype(jnp.float32), wq,
                                    norm=(nw, 1e-5), rows_hint=hint)
                np.testing.assert_array_equal(np.asarray(qb)[:4],
                                              np.asarray(qs))
        finally:
            Q.set_matmul_backend(old)
            Q.set_dense_kernels(False)

    def test_quant_layer_tail_matches_pair(self):
        """quant_layer_tail_pallas (wo + residual + FFN + residual in ONE
        call) == the _wo_residual + quant_mlp composition."""
        import jax

        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops.pallas.quant_matmul import quant_layer_tail_pallas

        rng = np.random.RandomState(31)
        K, D, F, M = 128, 256, 512, 8
        a = jnp.asarray(rng.randn(M, K).astype(np.float32))
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        nw = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        wo = Q.quantize_weight(jnp.asarray(rng.randn(K, D), jnp.float32),
                               bits=8)
        w13 = Q.quantize_weight(jnp.asarray(rng.randn(D, 2 * F), jnp.float32),
                                bits=8)
        w2 = Q.quantize_weight(jnp.asarray(rng.randn(F, D), jnp.float32),
                               bits=8)
        h = x + Q.quant_matmul(a, wo)
        gu = Q.quant_matmul(Q._rms_norm(h, nw, 1e-5), w13)
        gated = jax.nn.silu(gu[..., :F]) * gu[..., F:]
        ref = h + Q.quant_matmul(gated, w2)
        out = quant_layer_tail_pallas(a, x, wo.q, wo.scale, w13.q, w13.scale,
                                      w2.q, w2.scale, nw, block_f=128,
                                      norm_eps=1e-5, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-3, rtol=3e-3)
        # dispatcher engages at these shapes (pallas backend) and bails on
        # a dense wo
        old = Q._MATMUL_BACKEND
        Q.set_matmul_backend("pallas")
        try:
            y = Q.quant_layer_tail(a, x, wo, w13, w2, (nw, 1e-5))
            assert y is not None
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       atol=3e-3, rtol=3e-3)
            assert Q.quant_layer_tail(a, x, jnp.zeros((K, D)), w13, w2,
                                      (nw, 1e-5)) is None
        finally:
            Q.set_matmul_backend(old)

    def test_quant_mlp_dispatcher_end_to_end(self):
        """Q.quant_mlp through the pallas backend (interpret) == the jnp
        two-call composition; bails (None) on group-wise / int4 weights."""
        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops import pallas as PL

        rng = np.random.RandomState(13)
        D, F, M = 256, 512, 8
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        res = jnp.asarray(rng.randn(M, D).astype(np.float32))
        nw = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        w13 = Q.quantize_weight(jnp.asarray(rng.randn(D, 2 * F), jnp.float32),
                                bits=8)
        w2 = Q.quantize_weight(jnp.asarray(rng.randn(F, D), jnp.float32),
                               bits=8)
        gated = Q.quant_matmul(x, w13, norm=(nw, 1e-5), gate=True)
        ref = res + Q.quant_matmul(gated, w2)
        old = Q._MATMUL_BACKEND
        Q.set_matmul_backend("pallas")
        try:
            assert PL.use_interpret()
            out = Q.quant_mlp(x, w13, w2, (nw, 1e-5), residual=res)
            # int4 / group-wise weights must bail to the two-call path
            w13_g = Q.quantize_weight(
                jnp.asarray(rng.randn(D, 2 * F), jnp.float32),
                bits=8, group_size=32)
            assert Q.quant_mlp(x, w13_g, w2, (nw, 1e-5)) is None
        finally:
            Q.set_matmul_backend(old)
        assert out is not None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_fused_norm_gate_dispatcher_end_to_end(self):
        """Q.quant_matmul(norm=..., gate=True) through the pallas backend
        (interpret) == the jnp backend bit-for-bit semantics."""
        from magicdec_tpu import quantization as Q
        from magicdec_tpu.ops import pallas as PL

        rng = np.random.RandomState(3)
        In, F, M = 512, 256, 8
        w = jnp.asarray(rng.randn(In, 2 * F).astype(np.float32))
        x = jnp.asarray(rng.randn(M, In).astype(np.float32))
        nw = jnp.asarray(rng.rand(In).astype(np.float32) + 0.5)
        wq = Q.quantize_weight(w, bits=8)
        ref = Q.quant_matmul(x, wq, norm=(nw, 1e-5), gate=True)
        old = Q._MATMUL_BACKEND
        Q.set_matmul_backend("pallas")
        try:
            assert PL.use_interpret()
            out = Q.quant_matmul(x, wq, norm=(nw, 1e-5), gate=True)
        finally:
            Q.set_matmul_backend(old)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# fresh-token mode: window/chunk tokens as separate operands (the read-only
# layer-scan design — ops/attention.attend_cache) must equal attending over
# the appended cache.
# ---------------------------------------------------------------------------


def _fresh_setup(seed, B, Hkv, G, S, hd, T):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, T, Hkv * hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, T, Hkv * hd), jnp.float32)
    base = jnp.asarray([3, S // 2, S - T][:B], jnp.int32)
    return q, k, v, k_new, v_new, base


def _appended(cache, rows, base):
    out = np.asarray(cache).copy()
    for b in range(cache.shape[0]):
        p = int(base[b])
        out[b, p:p + rows.shape[1]] = np.asarray(rows)[b]
    return jnp.asarray(out)


@pytest.mark.parametrize("T,layered,block_s", [
    (1, False, 64), (4, True, 64),
    (2, True, 256),  # single whole-cache block + double-buffer window
    (4, True, 256),
])
def test_flash_decode_fresh_matches_appended(T, layered, block_s):
    from magicdec_tpu.ops.pallas.decode_attention import flash_decode_attend

    B, Hkv, G, S, hd = 3, 2, 2, 256, 64
    q, k, v, k_new, v_new, base = _fresh_setup(21, B, Hkv, G, S, hd, T)
    ka, va = _appended(k, k_new, base), _appended(v, v_new, base)
    ref = attend(q, ka, va, base)
    if layered:
        k, v = jnp.stack([jnp.zeros_like(k), k]), jnp.stack([jnp.zeros_like(v), v])
        layer = jnp.asarray(1, jnp.int32)
    else:
        layer = None
    out = flash_decode_attend(q, k, v, base, layer=layer, k_new=k_new,
                              v_new=v_new, block_s=block_s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("C", [32, 64])
def test_flash_prefill_fresh_matches_appended(C):
    from magicdec_tpu.ops.pallas.prefill_attention import flash_prefill_attend

    B, Hkv, G, S, hd = 2, 2, 2, 256, 64
    q, k, v, k_new, v_new, base = _fresh_setup(22, B, Hkv, G, S, hd, C)
    ka, va = _appended(k, k_new, base), _appended(v, v_new, base)
    ref = attend(q, ka, va, base)
    out = flash_prefill_attend(q, k, v, base, k_new=k_new, v_new=v_new,
                               block_s=64, block_r=C * G, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_fresh_from_empty_cache():
    """base = 0 for some requests: only the fresh tokens are visible."""
    from magicdec_tpu.ops.pallas.decode_attention import flash_decode_attend

    B, Hkv, G, S, hd, T = 2, 2, 2, 128, 64, 3
    rng = np.random.RandomState(23)
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, T, Hkv * hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, T, Hkv * hd), jnp.float32)
    base = jnp.asarray([0, 64], jnp.int32)
    ref = attend(q, _appended(k, k_new, base), _appended(v, v_new, base), base)
    out = flash_decode_attend(q, k, v, base, k_new=k_new, v_new=v_new,
                              block_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pick_block_s_any_divisor():
    """512-rounded caches must still get big KV blocks: _pick_block_s searches
    ALL 128-multiple divisors, not just powers of two (32k ctx at B=32 only
    fits HBM with 512-rounding — S=33280 decodes at 6656-row int4 blocks)."""
    from magicdec_tpu.ops.attention import _pick_block_s

    assert _pick_block_s(33280, 256) == 6656   # raw 2MiB budget
    # int4 kernels pass a 512KiB budget (4 bf16 nibble-unpack planes per
    # block — 4352 rows measured 940KiB OVER the 16MiB scoped-VMEM limit)
    assert _pick_block_s(33280, 256, budget=512 * 1024) == 1664
    assert _pick_block_s(34816, 256, budget=512 * 1024) == 2048
    assert _pick_block_s(33280, 512) == 3328   # int8 lanes
    assert _pick_block_s(8704, 512) == 2176
    assert _pick_block_s(8704, 1024) == 512    # bf16 lanes: 2176/1088 not 128-multiples
    assert _pick_block_s(640, 512) == 640      # whole draft row fits
    assert _pick_block_s(2048, 4096) == 512    # budget-capped power of two


def test_flash_decode_non_pow2_block():
    """Non-power-of-two block_s (the generalized _pick_block_s choice)."""
    rng = np.random.RandomState(7)
    B, Hkv, G, S, hd, T = 2, 2, 2, 1920, 64, 4
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([17, 1900], jnp.int32)
    ref = attend(q, k, v, base, causal=True)
    for block_s in (384, 640):
        out = flash_decode_attend(q, k, v, base, block_s=block_s, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("T,fresh", [(1, False), (4, False), (1, True), (4, True)])
def test_whole_row_multi_request_kernel(T, fresh):
    """block_s == S with even B takes the request-grouped whole-row kernel
    (grid B/bb, local softmax) — must match the oracle exactly like the
    blocked path."""
    rng = np.random.RandomState(11)
    B, Hkv, G, S, hd = 4, 2, 2, 256, 64
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([17, 100, 0 if fresh else 3, S - T], jnp.int32)
    kw = {}
    if fresh:
        kn = jnp.asarray(rng.randn(B, T, Hkv * hd), jnp.float32)
        vn = jnp.asarray(rng.randn(B, T, Hkv * hd), jnp.float32)
        kw = dict(k_new=kn, v_new=vn)
        ref_k, ref_v = k, v
        for b in range(B):
            ref_k = ref_k.at[b, base[b]:base[b] + T].set(kn[b])
            ref_v = ref_v.at[b, base[b]:base[b] + T].set(vn[b])
        ref = attend(q, ref_k, ref_v, base, causal=True)
    else:
        ref = attend(q, k, v, base, causal=True)
    out = flash_decode_attend(q, k, v, base, block_s=S, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_whole_row_layered_matches_blocked():
    """Layer-stacked cache through the whole-row path == blocked path."""
    rng = np.random.RandomState(12)
    L, B, Hkv, G, S, hd, T = 3, 4, 2, 2, 256, 64, 2
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(L, B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(L, B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([7, 31, 100, S - T], jnp.int32)
    for l in range(L):
        whole = flash_decode_attend(q, k, v, base, layer=l, block_s=S,
                                    interpret=True)
        blocked = flash_decode_attend(q, k, v, base, layer=l, block_s=64,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(whole), np.asarray(blocked),
                                   atol=2e-5, rtol=2e-5)
