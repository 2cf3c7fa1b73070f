"""int8 KV cache (EngineConfig.kv_quant): quantized append/attend numerics,
Pallas kernel parity, and the golden gates with a quantized target cache.

No reference equivalent — the reference keeps bf16 caches; this is the
TPU-native answer to decode being KV-bandwidth-bound (SURVEY.md §6: speedups
grow with batch/context because verify streams the whole cache)."""

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
from magicdec_tpu.ops import kv_cache as kv_ops
from magicdec_tpu.ops.attention import attend, attend_quant
from magicdec_tpu.ops.pallas.decode_attention import flash_decode_attend_quant
from tests.test_spec_parity import CFG, PARAMS, _prompt


def _quantize_full(x, n_kv):
    """Quantize an entire [B, S, K] cache (helper via the token quantizer)."""
    B, S, K = x.shape
    return kv_ops.quantize_kv_tokens(x.reshape(B, S, n_kv, K // n_kv))


def test_quant_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 4, 64) * 3.0, jnp.float32)
    q, s = kv_ops.quantize_kv_tokens(x)
    deq = kv_ops.dequant_kv(q, s, 64)
    err = np.abs(np.asarray(deq).reshape(x.shape) - np.asarray(x))
    # per-(token, head) scale: error <= scale/2 = amax/254 per entry
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (err <= amax / 254 + 1e-6).all()


def test_append_kv_quant_positions():
    B, S, H, hd = 2, 32, 2, 8
    kc = jnp.zeros((B, S, H * hd), jnp.int8)
    ks = jnp.zeros((B, H, S), jnp.float32)
    rng = np.random.RandomState(1)
    k_new = jnp.asarray(rng.randn(B, 3, H, hd), jnp.float32)
    pos = jnp.asarray([4, 20], jnp.int32)
    kc2, _, ks2, _ = kv_ops.append_kv_quant(kc, kc, ks, ks, k_new, k_new, pos)
    deq = np.asarray(kv_ops.dequant_kv(kc2, ks2, hd))
    for b, p in enumerate([4, 20]):
        np.testing.assert_allclose(deq[b, p:p + 3].reshape(3, H, hd),
                                   np.asarray(k_new)[b], atol=0.05)
        assert (deq[b, :p] == 0).all() and (deq[b, p + 3:] == 0).all()


def test_attend_quant_equals_attend_on_dequant():
    rng = np.random.RandomState(2)
    B, T, Hkv, G, S, hd = 2, 3, 2, 2, 64, 32
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([10, S - T], jnp.int32)
    kq, ksc = _quantize_full(k, Hkv)
    vq, vsc = _quantize_full(v, Hkv)
    out = attend_quant(q, kq, ksc, vq, vsc, base)
    ref = attend(q, kv_ops.dequant_kv(kq, ksc, hd),
                 kv_ops.dequant_kv(vq, vsc, hd), base)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # and close to the unquantized attention
    full = attend(q, k, v, base)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=0.05)


@pytest.mark.parametrize("T,G,hd,block_s", [
    (1, 4, 64, 64),    # plain decode
    (4, 4, 64, 64),    # verify window
    (2, 1, 128, 128),  # MHA, big head
])
def test_flash_decode_quant_matches_oracle(T, G, hd, block_s):
    rng = np.random.RandomState(3)
    B, Hkv, S = 3, 2, 256
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([17, 100, 256 - T], jnp.int32)
    kq, ksc = _quantize_full(k, Hkv)
    vq, vsc = _quantize_full(v, Hkv)
    ref = attend_quant(q, kq, ksc, vq, vsc, base)
    out = flash_decode_attend_quant(q, kq, ksc, vq, vsc, base,
                                    block_s=block_s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_prefill_quant_matches_oracle():
    from magicdec_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attend_quant)

    rng = np.random.RandomState(7)
    B, Hkv, G, C, S, hd = 2, 2, 2, 64, 256, 64
    q = jnp.asarray(rng.randn(B, C, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([32, S - C], jnp.int32)
    kq, ksc = _quantize_full(k, Hkv)
    vq, vsc = _quantize_full(v, Hkv)
    ref = attend_quant(q, kq, ksc, vq, vsc, base)
    out = flash_prefill_attend_quant(q, kq, ksc, vq, vsc, base,
                                     block_s=64, block_r=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def _ecfg(mode, **kw):
    base = dict(mode=mode, gamma=3, draft_budget=33, max_seq_len=256,
                chunk_size=16, window_size=8, sink_size=4, max_gen=20,
                eot_ids=(-1,), cache_dtype=jnp.float32, kv_quant=True)
    base.update(kw)
    return EngineConfig(**base)


@pytest.mark.parametrize("mode,prefix", [("streamingllm", 96), ("snapkv", 104)])
def test_spec_parity_with_quantized_cache(mode, prefix):
    """Golden gate under kv_quant: greedy spec must reproduce greedy
    autoregressive decoding, BOTH running on the int8 target cache (the
    quantized model defines its own greedy trajectory)."""
    B, max_gen = 2, 20
    engine = SpecEngine(PARAMS, CFG, _ecfg(mode))
    prompt = _prompt(B, prefix, seed=9)

    bst = engine.encode_baseline(prompt)
    _, bstats = engine.generate_baseline(bst, max_new=max_gen)
    ref = np.asarray(bstats["output"][:, :max_gen])

    st = engine.encode(prompt)
    st, stats = engine.generate(st)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= max_gen
    for b in range(B):
        m = min(int(n[b]), max_gen)
        np.testing.assert_array_equal(
            out[b, :m], ref[b, :m],
            err_msg=f"kv_quant spec parity broken ({mode})")


def test_serving_with_quantized_cache_matches_solo():
    """Admission splices the int8 cache AND its scale planes per slot."""
    from magicdec_tpu.engine.serving import ServingEngine

    ecfg = _ecfg("streamingllm", max_gen=10)
    rng = np.random.RandomState(6)
    prompts = [rng.randint(0, CFG.vocab_size, size=48).astype(np.int32)
               for _ in range(3)]
    engine = ServingEngine(PARAMS, CFG, ecfg)
    outs = engine.serve(prompts, B=2, windows_per_sync=2)
    solo = SpecEngine(PARAMS, CFG, ecfg)
    for prompt, out in zip(prompts, outs):
        st = solo.encode(jnp.asarray(prompt)[None])
        st, stats = solo.generate(st)
        n = int(np.asarray(stats["num_committed"])[0])
        np.testing.assert_array_equal(out, np.asarray(stats["output"])[0, :n])


def test_quantized_cache_close_to_bf16_trajectory():
    """The int8-cache greedy continuation should mostly agree with the
    full-precision one over a short horizon (numeric sanity, not a gate)."""
    B, prefix, max_gen = 2, 96, 12
    full = SpecEngine(PARAMS, CFG, _ecfg("streamingllm", kv_quant=False))
    quant = SpecEngine(PARAMS, CFG, _ecfg("streamingllm"))
    prompt = _prompt(B, prefix, seed=10)
    _, sf = full.generate_baseline(full.encode_baseline(prompt), max_new=max_gen)
    _, sq = quant.generate_baseline(quant.encode_baseline(prompt), max_new=max_gen)
    a = np.asarray(sf["output"][:, :max_gen])
    b = np.asarray(sq["output"][:, :max_gen])
    agree = (a == b).mean()
    assert agree > 0.5, f"suspiciously low agreement {agree}"


# ---------------------------------------------------------------------------
# int4 (head-pair nibble packing, kv_quant="int4")
# ---------------------------------------------------------------------------


def _quantize_full4(x, n_kv):
    B, S, K = x.shape
    return kv_ops.quantize_kv_tokens_int4(x.reshape(B, S, n_kv, K // n_kv))


def test_int4_pack_unpack_roundtrip():
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randint(-7, 8, size=(3, 5, 6, 16)), jnp.int8)
    packed = kv_ops.pack_int4_heads(q)
    assert packed.shape == (3, 5, 3 * 16)
    out = kv_ops.unpack_int4_heads(packed.reshape(3, 5, -1), 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(q))


def test_int4_quant_roundtrip_error_bounded():
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 16, 4, 64) * 3.0, jnp.float32)
    q, s = kv_ops.quantize_kv_tokens_int4(x)
    assert q.shape == (2, 16, 2 * 64)
    deq = kv_ops.dequant_kv(q, s, 64)
    err = np.abs(np.asarray(deq).reshape(x.shape) - np.asarray(x))
    # per-(token, head) scale: error <= scale/2 = amax/14 per entry
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (err <= amax / 14 + 1e-6).all()


def test_append_kv_quant4_positions():
    B, S, H, hd = 2, 32, 4, 8
    kc = jnp.zeros((B, S, H // 2 * hd), jnp.int8)
    ks = jnp.zeros((B, H, S), jnp.float32)
    rng = np.random.RandomState(13)
    k_new = jnp.asarray(rng.randn(B, 3, H, hd), jnp.float32)
    pos = jnp.asarray([4, 20], jnp.int32)
    kc2, _, ks2, _ = kv_ops.append_kv_quant4(kc, kc, ks, ks, k_new, k_new, pos)
    deq = np.asarray(kv_ops.dequant_kv(kc2, ks2, hd))
    for b, p in enumerate([4, 20]):
        np.testing.assert_allclose(deq[b, p:p + 3].reshape(3, H, hd),
                                   np.asarray(k_new)[b], atol=0.35)
        assert (deq[b, :p] == 0).all() and (deq[b, p + 3:] == 0).all()


@pytest.mark.parametrize("T,G,hd,block_s", [
    (1, 4, 64, 64),    # plain decode
    (4, 4, 64, 64),    # verify window
    (2, 2, 128, 128),  # GQA, big head
])
def test_flash_decode_quant4_matches_oracle(T, G, hd, block_s):
    from magicdec_tpu.ops.pallas.decode_attention import (
        flash_decode_attend_quant4)

    rng = np.random.RandomState(14)
    B, Hkv, S = 3, 4, 256
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([17, 100, 256 - T], jnp.int32)
    kq, ksc = _quantize_full4(k, Hkv)
    vq, vsc = _quantize_full4(v, Hkv)
    ref = attend_quant(q, kq, ksc, vq, vsc, base)
    out = flash_decode_attend_quant4(q, kq, ksc, vq, vsc, base,
                                     block_s=block_s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_prefill_quant4_matches_oracle():
    from magicdec_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attend_quant4)

    rng = np.random.RandomState(15)
    B, Hkv, G, C, S, hd = 2, 4, 2, 64, 256, 64
    q = jnp.asarray(rng.randn(B, C, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv * hd), jnp.float32)
    base = jnp.asarray([32, S - C], jnp.int32)
    kq, ksc = _quantize_full4(k, Hkv)
    vq, vsc = _quantize_full4(v, Hkv)
    ref = attend_quant(q, kq, ksc, vq, vsc, base)
    out = flash_prefill_attend_quant4(q, kq, ksc, vq, vsc, base,
                                      block_s=64, block_r=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode,prefix", [("streamingllm", 96), ("snapkv", 104)])
def test_spec_parity_with_int4_cache(mode, prefix):
    """Golden gate under kv_quant='int4': greedy spec must reproduce greedy
    autoregressive decoding, BOTH on the int4-packed target cache."""
    B, max_gen = 2, 20
    engine = SpecEngine(PARAMS, CFG, _ecfg(mode, kv_quant="int4"))
    prompt = _prompt(B, prefix, seed=16)

    bst = engine.encode_baseline(prompt)
    _, bstats = engine.generate_baseline(bst, max_new=max_gen)
    ref = np.asarray(bstats["output"][:, :max_gen])

    st = engine.encode(prompt)
    st, stats = engine.generate(st)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= max_gen
    for b in range(B):
        m = min(int(n[b]), max_gen)
        np.testing.assert_array_equal(
            out[b, :m], ref[b, :m],
            err_msg=f"kv_quant=int4 spec parity broken ({mode})")


def test_int4_odd_kv_heads_rejected():
    from magicdec_tpu.config import tiny_config

    cfg = tiny_config(n_head=3, n_kv_head=3)
    engine = SpecEngine({}, cfg, _ecfg("streamingllm", kv_quant="int4"))
    with pytest.raises(ValueError, match="even kv-head"):
        engine._zero_target_caches(2)


@pytest.mark.parametrize("bits,T", [(8, 1), (8, 4), (4, 1), (4, 4)])
def test_flash_decode_quant_fresh_matches_appended(bits, T):
    """fresh-token mode (quantized rows as separate operands) must equal
    attending over the appended quantized cache — the numerics that make the
    read-only layer scan safe for golden parity."""
    from magicdec_tpu.ops.pallas.decode_attention import (
        flash_decode_attend_quant, flash_decode_attend_quant4)

    rng = np.random.RandomState(24)
    B, Hkv, G, S, hd = 3, 4, 2, 256, 64
    q = jnp.asarray(rng.randn(B, T, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, T, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, T, Hkv, hd), jnp.float32)
    base = jnp.asarray([0, 100, S - T], jnp.int32)

    qz = (kv_ops.quantize_kv_tokens if bits == 8
          else kv_ops.quantize_kv_tokens_int4)
    kq, ks = qz(k)
    vq, vs = qz(v)
    knq, ksn = qz(k_new)
    vnq, vsn = qz(v_new)

    # reference: append the SAME quantized rows + scales, then oracle-attend
    def app(c, r, base):
        out = np.asarray(c).copy()
        for b in range(B):
            p = int(base[b])
            out[b, p:p + T] = np.asarray(r)[b]
        return jnp.asarray(out)

    def app_s(s, r, base):
        out = np.asarray(s).copy()
        for b in range(B):
            p = int(base[b])
            out[b, :, p:p + T] = np.asarray(r)[b]
        return jnp.asarray(out)

    ref = attend_quant(q, app(kq, knq, base), app_s(ks, ksn, base),
                       app(vq, vnq, base), app_s(vs, vsn, base), base)
    fn = flash_decode_attend_quant if bits == 8 else flash_decode_attend_quant4
    out = fn(q, kq, ks, vq, vs, base, k_new=knq, v_new=vnq, ks_new=ksn,
             vs_new=vsn, block_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bits", [8, 4])
def test_flash_prefill_quant_fresh_matches_appended(bits):
    from magicdec_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attend_quant, flash_prefill_attend_quant4)

    rng = np.random.RandomState(25)
    B, Hkv, G, C, S, hd = 2, 4, 2, 64, 256, 64
    q = jnp.asarray(rng.randn(B, C, Hkv * G, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, C, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, C, Hkv, hd), jnp.float32)
    base = jnp.asarray([0, S - C], jnp.int32)

    qz = (kv_ops.quantize_kv_tokens if bits == 8
          else kv_ops.quantize_kv_tokens_int4)
    kq, ks = qz(k)
    vq, vs = qz(v)
    knq, ksn = qz(k_new)
    vnq, vsn = qz(v_new)

    def app(c, r, base):
        out = np.asarray(c).copy()
        for b in range(B):
            p = int(base[b])
            out[b, p:p + C] = np.asarray(r)[b]
        return jnp.asarray(out)

    def app_s(s, r, base):
        out = np.asarray(s).copy()
        for b in range(B):
            p = int(base[b])
            out[b, :, p:p + C] = np.asarray(r)[b]
        return jnp.asarray(out)

    ref = attend_quant(q, app(kq, knq, base), app_s(ks, ksn, base),
                       app(vq, vnq, base), app_s(vs, vsn, base), base)
    fn = (flash_prefill_attend_quant if bits == 8
          else flash_prefill_attend_quant4)
    out = fn(q, kq, ks, vq, vs, base, k_new=knq, v_new=vnq, ks_new=ksn,
             vs_new=vsn, block_s=64, block_r=C * G, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("kv", ["int8", "int4"])
def test_spec_parity_with_bf16_scales(kv):
    """kv_scale_dtype=bf16 (half the scale memory/traffic): greedy spec must
    still reproduce greedy AR on the same quantized cache, and the stored
    scales must actually be bf16."""
    B, prefix, max_gen = 2, 96, 16
    engine = SpecEngine(PARAMS, CFG, _ecfg("streamingllm", kv_quant=kv,
                                           kv_scale_dtype=jnp.bfloat16,
                                           max_gen=max_gen))
    prompt = _prompt(B, prefix, seed=13)

    bst = engine.encode_baseline(prompt)
    assert bst.ks.dtype == jnp.bfloat16
    _, bstats = engine.generate_baseline(bst, max_new=max_gen)
    ref = np.asarray(bstats["output"][:, :max_gen])

    st = engine.encode(prompt)
    assert st.ks.dtype == jnp.bfloat16
    st, stats = engine.generate(st)
    out = np.asarray(stats["output"])
    n = np.asarray(stats["num_committed"])
    assert n.max() >= max_gen
    for b in range(B):
        m = min(int(n[b]), max_gen)
        np.testing.assert_array_equal(out[b, :m], ref[b, :m])


def test_quantize_tokens_bf16_scale_roundtrip():
    """q is computed against the ROUNDED bf16 scale, so q * stored_scale is
    the dequant in every path (fresh operands == appended cache)."""
    from magicdec_tpu.ops import kv_cache as kv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 4, 8), jnp.float32)
    q, s = kv.quantize_kv_tokens(x, scale_dtype=jnp.bfloat16)
    assert s.dtype == jnp.bfloat16
    deq = kv.dequant_kv(q, s, 8)
    err = np.abs(np.asarray(deq).reshape(2, 3, 4, 8) - np.asarray(x))
    amax = np.abs(np.asarray(x)).max(-1, keepdims=True)
    assert (err <= amax / 127 * 1.01 + 1e-6).all()
