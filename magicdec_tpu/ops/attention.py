"""Batched GQA attention over length-governed KV caches (jnp reference path).

These are the semantics flashinfer's BatchPrefillWithPagedKVCacheWrapper
provides the reference (Engine/SnapKV/backend.py:42-115): ragged per-request
lengths, causal masking aligned so the *end* of the query window coincides with
the *end* of the visible KV, GQA, softmax in fp32.  Shapes are static; raggedness
is expressed through masks, which is what keeps the whole decode step jittable.

A Pallas flash kernel (magicdec_tpu.ops.pallas) replaces this on the hot path;
this module is the numerics oracle it is tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from magicdec_tpu.ops.shard import FlashShard, backend_kind

NEG_INF = -1e30


def _interp() -> bool:
    from magicdec_tpu.ops import pallas as PL
    return PL.use_interpret()


def attend(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
           base_lens: jnp.ndarray, *, causal: bool = True) -> jnp.ndarray:
    """Multi-token decode / verify / chunked-prefill attention.

    q:        [B, T, H_q, D]   (T = 1 decode, gamma+1 verify, chunk prefill)
    k_cache:  [B, S, H_kv*D]   (already contains the T new tokens; head axis
                                folded minor — see ops.kv_cache)
    v_cache:  [B, S, H_kv*D]
    base_lens:[B] int32 — visible KV length *before* the T new tokens.
              Query row t attends cache slots [0, base_lens + t + 1) when causal,
              else [0, base_lens + T).
    Returns:  [B, T, H_q, D] in q.dtype.
    """
    B, T, Hq, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2] // D
    G = Hq // Hkv
    kh = k_cache.reshape(B, S, Hkv, D)
    vh = v_cache.reshape(B, S, Hkv, D)

    qg = q.reshape(B, T, Hkv, G, D)
    # scores: [B, Hkv, G, T, S]
    scores = jnp.einsum("btkgd,bskd->bkgts", qg.astype(jnp.float32),
                        kh.astype(jnp.float32))
    scores = scores * (1.0 / jnp.sqrt(D).astype(jnp.float32))

    col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        limit = base_lens[:, None, None] + row[None] + 1  # [B, T, S]
    else:
        limit = (base_lens + T)[:, None, None]
    mask = col[None] < limit  # [B, T, S]
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, vh.astype(jnp.float32))
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def attend_quant(q: jnp.ndarray, k_cache: jnp.ndarray, k_scale: jnp.ndarray,
                 v_cache: jnp.ndarray, v_scale: jnp.ndarray,
                 base_lens: jnp.ndarray, *, causal: bool = True) -> jnp.ndarray:
    """jnp oracle for int8-KV attention: dequantize + attend.

    k_cache/v_cache int8 [B, S, H_kv*hd]; k_scale/v_scale f32 [B, H_kv, S]
    (ops.kv_cache.quantize_kv_tokens layout).  XLA fuses the dequant multiply
    into the score/output dots; the Pallas decode kernel instead applies the
    scales around its dots without materialising dequantized KV.
    """
    from magicdec_tpu.ops import kv_cache as kv_ops

    hd = q.shape[-1]
    kd = kv_ops.dequant_kv(k_cache, k_scale, hd)
    vd = kv_ops.dequant_kv(v_cache, v_scale, hd)
    return attend(q, kd, vd, base_lens, causal=causal)


def _pick_block_s(S: int, lane_bytes: int, budget: int = 2 * 1024 * 1024) -> int | None:
    """Largest KV block (sublane rows) that divides S and keeps one block
    under ~2 MiB of VMEM.

    Bigger blocks matter: the decode kernels' per-head dots are tiny
    ([G*T, hd] x [hd, block_s]), so small blocks leave the MXU
    latency-bound and the kernel 2-3x off HBM bandwidth (measured on v5e at
    B=32/S=8192, T=5: bf16 1.38 -> 0.62 ms/layer and int8 0.99 -> 0.42 ms/layer
    going 512 -> 2048; XLA's fused path is 0.74/3.7 ms).  2 MiB/block keeps
    double-buffered k+v+q+out inside the 16 MiB scoped-VMEM limit.

    When the WHOLE cache row fits the block budget (draft caches are
    budget-sized, e.g. 640 slots), use one S-row block: 640 only tiles by
    128, and the (B, 5)-step grid of [GT, hd]x[hd, 128] dots left the draft
    attend at 7x its bandwidth roofline — 6.0 of the 7.0 ms draft step at
    llama-3.2-1b B=32 budget=513 (scripts/profile_draft.py, v5e).

    ``budget``: bytes of one raw KV block.  The int4 kernel passes 512 KiB
    instead of the 2 MiB default because its per-block VMEM is ~8x the raw
    block (double-buffered k+v packed blocks + FOUR bf16 nibble-unpack
    planes): a 4352-row int4 block compiles to 16.9 MiB of scoped VMEM,
    940 KiB over the 16 MiB hard limit (measured on v5e — the AOT compiler
    rejects it).  512 KiB caps int4 blocks at the known-good 2048 rows.
    """
    if S % 8 == 0 and S * lane_bytes <= budget:
        return S
    # any 128-multiple divisor of S works (the kernels only require
    # S % block_s == 0 and 8-divisible sublanes); searching all of them
    # instead of powers of two matters for 512-rounded caches — e.g.
    # S=33280 (32k ctx rounded to 512 to fit HBM) has no power-of-two
    # divisor above 512, but 6656 rows keep the kernel bandwidth-bound
    best = None
    for bs in range(128, min(S, budget // max(lane_bytes, 1)) + 1, 128):
        if S % bs == 0:
            best = bs
    return best


def _pick_block_r(GT: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of the grouped-query row count <= cap.

    min(cap, GT) is NOT always a divisor: ragged admission buckets produce
    remainder prefill chunks like T=224 -> G*T=896, which passes the
    (G*T) % 128 == 0 dispatch guard but crashes the kernel's
    GT % block_r == 0 contract at block_r=512 (measured in paged serving
    with --ragged on hardware)."""
    best = 128
    for br in range(128, min(GT, cap) + 1, 128):
        if GT % br == 0:
            best = br
    return best


def attend_auto_quant(q, k_cache, k_scale, v_cache, v_scale, base_lens, *,
                      backend: str = "jnp") -> jnp.ndarray:
    """Causal quantized-KV attention with backend dispatch (int8 flat or int4
    head-pair-packed, detected from the cache lane width vs the scale's head
    count — see ops.kv_cache)."""
    hd = q.shape[-1]
    Hkv = k_scale.shape[1]
    packed4 = k_cache.shape[2] == (Hkv // 2) * hd
    if backend == "flash":
        S = k_cache.shape[1]
        T = q.shape[1]
        if T <= 16:
            # decode/verify: bandwidth-bound, big KV blocks amortize the tiny
            # per-head dots (see _pick_block_s)
            block_s = _pick_block_s(S, k_cache.shape[2],  # int8 lanes: 1 B
                                    budget=(512 * 1024 if packed4
                                            else 2 * 1024 * 1024))
            if block_s is not None:
                from magicdec_tpu.ops.pallas import decode_attention as DA
                fn = (DA.flash_decode_attend_quant4 if packed4
                      else DA.flash_decode_attend_quant)
                return fn(q, k_cache, k_scale, v_cache, v_scale, base_lens,
                          block_s=block_s, interpret=_interp())
        else:
            # prefill: MXU-bound with large row blocks; keep KV blocks small
            # so q/out/score/unpack buffers fit scoped VMEM
            G = q.shape[2] // Hkv
            block_s = 512 if S % 512 == 0 else (128 if S % 128 == 0 else None)
            if block_s is not None and (G * T) % 128 == 0:
                from magicdec_tpu.ops.pallas import prefill_attention as PA
                fn = (PA.flash_prefill_attend_quant4 if packed4
                      else PA.flash_prefill_attend_quant)
                return fn(q, k_cache, k_scale, v_cache, v_scale, base_lens,
                          block_s=block_s, block_r=_pick_block_r(G * T),
                          interpret=_interp())
    return attend_quant(q, k_cache, k_scale, v_cache, v_scale, base_lens,
                        causal=True)


def attend_auto(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                base_lens: jnp.ndarray, *, backend: str = "jnp") -> jnp.ndarray:
    """Causal attention with backend dispatch.

    backend "flash": magicdec_tpu.ops.pallas flash kernels (TPU) — decode
    kernel for small query windows, row-blocked prefill kernel for chunks.
    Falls back to the jnp oracle when the cache length doesn't tile.
    """
    if backend == "flash":
        S = k_cache.shape[1]
        T = q.shape[1]
        if T <= 16:
            block_s = _pick_block_s(S, k_cache.shape[2] * k_cache.dtype.itemsize)
            if block_s is not None:
                from magicdec_tpu.ops.pallas.decode_attention import flash_decode_attend
                return flash_decode_attend(q, k_cache, v_cache, base_lens,
                                           block_s=block_s, interpret=_interp())
        else:
            G = q.shape[2] * q.shape[3] // k_cache.shape[2]
            block_s = 512 if S % 512 == 0 else (128 if S % 128 == 0 else None)
            if block_s is not None and (G * T) % 128 == 0:
                from magicdec_tpu.ops.pallas.prefill_attention import flash_prefill_attend
                return flash_prefill_attend(q, k_cache, v_cache, base_lens,
                                            block_s=block_s,
                                            block_r=_pick_block_r(G * T),
                                            interpret=_interp())
    return attend(q, k_cache, v_cache, base_lens, causal=True)


# ---------------------------------------------------------------------------
# Layer-stacked dispatch (zero-copy layer scan)
# ---------------------------------------------------------------------------


def _slice_layer(x, layer):
    return jax.lax.dynamic_index_in_dim(x, layer, 0, keepdims=False)


def _dus_rows(cache_l, rows, pos):
    """Write rows [B, T, Kc] at per-request pos into a layer slice [B, S, Kc]."""
    def _upd(c_b, r_b, p_b):
        return jax.lax.dynamic_update_slice(c_b, r_b.astype(c_b.dtype), (p_b, 0))
    return jax.vmap(_upd)(cache_l, rows, pos)


def _dus_scale_rows(scale_l, rows, pos):
    """Write scale rows [B, H, T] at pos into a layer slice [B, H, S]."""
    def _upd(s_b, r_b, p_b):
        return jax.lax.dynamic_update_slice(s_b, r_b, (0, p_b))
    return jax.vmap(_upd)(scale_l, rows, pos)


def attend_cache(q, caches, base_lens, *, layer, backend: str = "jnp",
                 prefix: str = "", fresh=None) -> jnp.ndarray:
    """Causal attention over layer `layer` of stacked caches.

    caches: {'k','v'} (+ {'ks','vs'} when quantized) with arrays [L, B, ...];
    `prefix` renames the keys (draft caches use 'dk'/'dv').  The flash path
    passes the stacked arrays straight into the kernels (BlockSpec index maps
    select the layer — no [B, S, K] slice is ever materialised; a slice
    feeding a custom call is a full HBM copy, ~4 full-cache passes per forward
    step when done per layer).  The jnp oracle path slices (tests/CPU).

    ``fresh``: the T window/chunk tokens when the cache does NOT yet contain
    them — the caller appends these exact rows AFTER attention so the cache
    buffer keeps a single-ownership chain across the layer scan (a scatter
    and a kernel both consuming the same buffer in one scan body forces
    full-cache copies: measured 320ms vs 25ms per decode step at 8k/B=32).
    Dense caches: {'k': [B,T,K] rows, 'v': ...} in cache dtype; quantized:
    {'k','v' int8/int4-packed rows, 'ks','vs' f32 [B,Hkv,T]} — the SAME
    quantized values that get appended, so numerics are bit-identical to
    attending over the appended cache.

    ``backend`` may be an ops.shard.FlashShard: the same flash path runs
    per-shard under shard_map (batch on the data axis, whole kv heads on the
    model axes) — the TPU-native equivalent of the reference running
    flashinfer under tensor parallelism (Engine/tp.py:202-207).
    """
    if isinstance(backend, FlashShard):
        from magicdec_tpu.ops import shard as shard_ops
        if caches.get(prefix + "table") is not None:
            return shard_ops.attend_cache_paged_sharded(
                backend, q, caches, base_lens, layer=layer, prefix=prefix,
                fresh=fresh)
        return shard_ops.attend_cache_sharded(backend, q, caches, base_lens,
                                              layer=layer, prefix=prefix,
                                              fresh=fresh)
    if caches.get(prefix + "table") is not None:
        return _attend_cache_paged(q, caches, base_lens, layer=layer,
                                   backend=backend, prefix=prefix, fresh=fresh)
    k_cache = caches[prefix + "k"]
    v_cache = caches[prefix + "v"]
    quant = (prefix + "ks") in caches and caches.get(prefix + "ks") is not None
    hd = q.shape[-1]
    T = q.shape[1]
    S = k_cache.shape[2]

    if quant:
        k_scale = caches[prefix + "ks"]
        v_scale = caches[prefix + "vs"]
        Hkv = k_scale.shape[2]
        packed4 = k_cache.shape[3] == (Hkv // 2) * hd
        fresh_kw = ({} if fresh is None else
                    dict(k_new=fresh["k"], v_new=fresh["v"],
                         ks_new=fresh["ks"], vs_new=fresh["vs"]))
        if backend == "flash":
            if T <= 16:
                block_s = _pick_block_s(S, k_cache.shape[3],
                                        budget=(512 * 1024 if packed4
                                                else 2 * 1024 * 1024))
                if block_s is not None:
                    from magicdec_tpu.ops.pallas import decode_attention as DA
                    fn = (DA.flash_decode_attend_quant4 if packed4
                          else DA.flash_decode_attend_quant)
                    return fn(q, k_cache, k_scale, v_cache, v_scale,
                              base_lens, layer=layer, block_s=block_s,
                              interpret=_interp(), **fresh_kw)
            else:
                G = q.shape[2] // Hkv
                block_s = 512 if S % 512 == 0 else (128 if S % 128 == 0 else None)
                if block_s is not None and (G * T) % 128 == 0:
                    from magicdec_tpu.ops.pallas import prefill_attention as PA
                    fn = (PA.flash_prefill_attend_quant4 if packed4
                          else PA.flash_prefill_attend_quant)
                    return fn(q, k_cache, k_scale, v_cache, v_scale,
                              base_lens, layer=layer, block_s=block_s,
                              block_r=_pick_block_r(G * T), interpret=_interp(),
                              **fresh_kw)
        kc = _slice_layer(k_cache, layer)
        vc = _slice_layer(v_cache, layer)
        ks = _slice_layer(k_scale, layer)
        vs = _slice_layer(v_scale, layer)
        if fresh is not None:  # oracle: append into the slice, then attend
            kc = _dus_rows(kc, fresh["k"], base_lens)
            vc = _dus_rows(vc, fresh["v"], base_lens)
            ks = _dus_scale_rows(ks, fresh["ks"], base_lens)
            vs = _dus_scale_rows(vs, fresh["vs"], base_lens)
        return attend_quant(q, kc, ks, vc, vs, base_lens, causal=True)

    fresh_kw = ({} if fresh is None else
                dict(k_new=fresh["k"], v_new=fresh["v"]))
    if backend == "flash":
        if T <= 16:
            block_s = _pick_block_s(S, k_cache.shape[3] * k_cache.dtype.itemsize)
            if block_s is not None:
                from magicdec_tpu.ops.pallas.decode_attention import flash_decode_attend
                return flash_decode_attend(q, k_cache, v_cache, base_lens,
                                           layer=layer, block_s=block_s,
                                           interpret=_interp(), **fresh_kw)
        else:
            G = q.shape[2] * hd // k_cache.shape[3]
            block_s = 512 if S % 512 == 0 else (128 if S % 128 == 0 else None)
            if block_s is not None and (G * T) % 128 == 0:
                from magicdec_tpu.ops.pallas.prefill_attention import flash_prefill_attend
                return flash_prefill_attend(q, k_cache, v_cache, base_lens,
                                            layer=layer, block_s=block_s,
                                            block_r=_pick_block_r(G * T),
                                            interpret=_interp(), **fresh_kw)
    kc = _slice_layer(k_cache, layer)
    vc = _slice_layer(v_cache, layer)
    if fresh is not None:
        kc = _dus_rows(kc, fresh["k"], base_lens)
        vc = _dus_rows(vc, fresh["v"], base_lens)
    return attend(q, kc, vc, base_lens, causal=True)


def _attend_cache_paged(q, caches, base_lens, *, layer, backend="jnp",
                        prefix="", fresh=None):
    """attend_cache over page POOLS (serving: caches carry ``table`` [B, npr]
    mapping logical KV blocks to pool pages — engine/serving.PagedServingEngine).

    flash + decode windows (T <= 16) run the Pallas paged kernels
    (ops/pallas/paged_attention.py: the page is the KV block); every other
    combination gathers the pool into the contiguous layout and reuses the
    contiguous path (oracle/CPU tests — the serving decode loop only ever
    issues small windows)."""
    table = caches[prefix + "table"]
    k_pool = caches[prefix + "k"]
    v_pool = caches[prefix + "v"]
    quant = caches.get(prefix + "ks") is not None
    T = q.shape[1]
    if backend == "flash" and T <= 16:
        from magicdec_tpu.ops.pallas import paged_attention as PGA
        if quant:
            k_scale = caches[prefix + "ks"]
            v_scale = caches[prefix + "vs"]
            Hkv = k_scale.shape[2]
            packed4 = k_pool.shape[3] == (Hkv // 2) * q.shape[-1]
            fresh_kw = ({} if fresh is None else
                        dict(k_new=fresh["k"], v_new=fresh["v"],
                             ks_new=fresh["ks"], vs_new=fresh["vs"]))
            fn = (PGA.flash_paged_decode_attend_quant4 if packed4
                  else PGA.flash_paged_decode_attend_quant)
            return fn(q, k_pool, k_scale, v_pool, v_scale, table, base_lens,
                      layer=layer, interpret=_interp(), **fresh_kw)
        fresh_kw = ({} if fresh is None else
                    dict(k_new=fresh["k"], v_new=fresh["v"]))
        return PGA.flash_paged_decode_attend(q, k_pool, v_pool, table,
                                             base_lens, layer=layer,
                                             interpret=_interp(), **fresh_kw)
    from magicdec_tpu.ops import paged_kv as PKV
    contig = {prefix + "k": PKV.pool_gather(k_pool, table),
              prefix + "v": PKV.pool_gather(v_pool, table)}
    if quant:
        contig[prefix + "ks"] = PKV.scale_pool_gather(caches[prefix + "ks"], table)
        contig[prefix + "vs"] = PKV.scale_pool_gather(caches[prefix + "vs"], table)
    return attend_cache(q, contig, base_lens, layer=layer, backend=backend,
                        prefix=prefix, fresh=fresh)
