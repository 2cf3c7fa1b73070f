"""Functional Llama-family decoder for TPU (pure JAX, scan-over-layers).

Covers the model layer of the reference (Engine/SnapKV/model.py:114-469,
Engine/StreamingLLM/model.py:159-447) re-designed TPU-first:

- immutable parameter pytree with layer-stacked weights, traversed with one
  ``lax.scan`` so compile time is O(1) in depth;
- KV caches are explicit inputs/outputs (no module state), length-governed
  (see magicdec_tpu.ops.kv_cache);
- every forward variant of the reference (forward / verify / draft_forward /
  prefill / draft_prefill) is expressed as the same layer skeleton with a
  different cache hook;
- the head returns greedy argmax token ids like the reference
  (Engine/SnapKV/model.py:171-188).  Under GSPMD a vocab-sharded lm_head +
  argmax compiles to the psum-based global argmax automatically, with the same
  lowest-index tie-breaking as a single chip — replacing the reference's
  manual two-allreduce argmax trick (Engine/SnapKV/model.py:178-188).

Weight shapes (F = intermediate size, hd = head_dim):
    embed      [V, D]
    layers.wq        [L, D, n_head*hd]     layers.bq [L, n_head*hd] (optional)
    layers.wk/wv     [L, D, n_kv_head*hd]  layers.bk/bv (optional)
    layers.wo        [L, n_head*hd, D]
    layers.w1/w3     [L, D, F]             layers.w2 [L, F, D]
    layers.attn_norm [L, D]                layers.ffn_norm [L, D]
    final_norm [D]
    lm_head    [D, V] (None when tied to embed)
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from magicdec_tpu.config import ModelConfig
from magicdec_tpu.ops import attention as attn_ops
from magicdec_tpu.ops import kv_cache as kv_ops
from magicdec_tpu.ops.rope import (apply_rope, apply_rope_cs, rope_cos_sin,
                                   rope_inv_freq)
from magicdec_tpu.quantization import (QuantizedWeight, dense_matmul,
                                       dense_mlp, is_quantized,
                                       quant_layer_tail, quant_matmul,
                                       quant_mlp)

# Layer-scan unroll factor, a perf A/B knob.  Read ONCE at import (not at
# trace time): already-jitted programs never reflect later env changes and the
# value is invisible to jit cache keys, so a mid-process change would
# otherwise silently split behavior between old and new traces.
_SCAN_UNROLL = int(os.environ.get("MAGICDEC_SCAN_UNROLL", "1"))

Params = Dict[str, Any]


def matmul(x: jnp.ndarray, w, rows_hint: int = 0) -> jnp.ndarray:
    """Linear layer dispatch: dense array or QuantizedWeight (int8/int4).
    ``rows_hint`` (cfg.decode_rows) must reach EVERY quantized matmul a
    TARGET decode/verify pass can take — see config.py's M-invariant
    routing contract."""
    if is_quantized(w):
        return quant_matmul(x, w, rows_hint=rows_hint)
    return x @ w
Caches = Any  # pytree of [L, ...] arrays


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (norm.astype(x.dtype)) * w


def _mlp(x: jnp.ndarray, wl: Params, cfg: ModelConfig,
         residual=None) -> jnp.ndarray:
    """FFN block INCLUDING its pre-norm: rms_norm -> silu-gated MLP
    [+ residual].

    The norm lives here (not in the scan body) so the quantized fused-exec
    path can sink it — and the SiLU gate — into the Pallas dequant-dot
    kernel: at decode shapes the [M, D] elementwise kernels stranded between
    opaque custom calls are pure fixed cost (~0.7 ms/16-layer draft scan).
    When both w13 and w2 are int8 per-channel, the WHOLE block (norm, gate|up
    dot, SiLU, down dot, residual add) is ONE pallas call
    (quantization.quant_mlp) — and its DENSE twin (quantization.dense_mlp)
    does the same for bf16 target weights on decode/verify passes
    (cfg.decode_rows > 0; the round-5 dense-path lever — see config.py for
    the M-invariant routing contract); ``residual`` otherwise adds outside."""
    w13 = wl.get("w13")
    hint = cfg.decode_rows
    norm = (wl["ffn_norm"], cfg.norm_eps)
    if w13 is not None and is_quantized(w13):
        y = quant_mlp(x, w13, wl["w2"], norm, residual=residual,
                      rows_hint=hint)
        if y is not None:
            return y
        gated = quant_matmul(x, w13, norm=norm, gate=True, rows_hint=hint)
        return quant_matmul(gated, wl["w2"], residual=residual,
                            rows_hint=hint)
    if w13 is not None:  # fused gate|up dot (fuse_exec_params)
        y = dense_mlp(x, w13, wl["w2"], norm, residual=residual,
                      rows_hint=hint)
        if y is not None:
            return y
        gu = dense_matmul(x, w13, norm=norm, rows_hint=hint)
        F = gu.shape[-1] // 2
        gate, up = gu[..., :F], gu[..., F:]
        return dense_matmul(jax.nn.silu(gate) * up, wl["w2"],
                            residual=residual, rows_hint=hint)
    x = rms_norm(x, *norm)
    gate = matmul(x, wl["w1"], rows_hint=hint)
    up = matmul(x, wl["w3"], rows_hint=hint)
    y = matmul(jax.nn.silu(gate) * up, wl["w2"], rows_hint=hint)
    return y if residual is None else residual + y


def _qkv(x: jnp.ndarray, wl: Params, cfg: ModelConfig):
    """x [B, T, D] (RAW, pre-norm) -> q [B,T,Hq,hd], k,v [B,T,Hkv,hd]
    (pre-rope).  Applies the attention pre-norm internally — fused into the
    Pallas dequant-dot on the quantized fused-exec path (see _mlp).

    q/k/v projections are stored as separate tensors (not the reference's
    fused wqkv, Engine/SnapKV/model.py:326) so each output column axis is a
    clean head axis for GSPMD model-parallel sharding; single-device engines
    fuse them into one dot at init (``fuse_exec_params``) — decode-shape dots
    are tiny (B rows), so 3 kernels -> 1 saves fixed per-kernel cost with
    bit-identical outputs (each output column's contraction is independent).
    """
    B, T, _ = x.shape
    hd = cfg.head_dim
    nq = cfg.n_head * hd
    nkv = cfg.n_kv_head * hd
    norm = (wl["attn_norm"], cfg.norm_eps)
    hint = cfg.decode_rows
    if wl.get("wqkv") is not None:
        if is_quantized(wl["wqkv"]) and wl.get("bqkv") is None:
            qkv = quant_matmul(x, wl["wqkv"], norm=norm, rows_hint=hint)
        elif not is_quantized(wl["wqkv"]):
            qkv = dense_matmul(x, wl["wqkv"], norm=norm, rows_hint=hint)
            if wl.get("bqkv") is not None:
                qkv = qkv + wl["bqkv"]
        else:
            qkv = matmul(rms_norm(x, *norm), wl["wqkv"], rows_hint=hint)
            if wl.get("bqkv") is not None:
                qkv = qkv + wl["bqkv"]
        q = qkv[..., :nq]
        k = qkv[..., nq:nq + nkv]
        v = qkv[..., nq + nkv:]
    else:
        x = rms_norm(x, *norm)
        q = matmul(x, wl["wq"], rows_hint=hint)
        k = matmul(x, wl["wk"], rows_hint=hint)
        v = matmul(x, wl["wv"], rows_hint=hint)
        if wl.get("bq") is not None:
            q = q + wl["bq"]
            k = k + wl["bk"]
            v = v + wl["bv"]
    return (q.reshape(B, T, cfg.n_head, hd),
            k.reshape(B, T, cfg.n_kv_head, hd),
            v.reshape(B, T, cfg.n_kv_head, hd))


def _wo_residual(x: jnp.ndarray, out: jnp.ndarray, wl: Params,
                 cfg: ModelConfig) -> jnp.ndarray:
    """h = x + attn_out @ wo: the attention output projection WITH its
    residual add (fused into the quantized dot's epilogue on the pallas path
    — see quantization.quant_matmul(residual=); one fewer stranded [M, D]
    elementwise dispatch per layer at decode shapes)."""
    B, t = out.shape[:2]
    o = out.reshape(B, t, cfg.n_head * cfg.head_dim)
    w = wl["wo"]
    if is_quantized(w):
        return quant_matmul(o, w, residual=x, rows_hint=cfg.decode_rows)
    return dense_matmul(o, w, residual=x, rows_hint=cfg.decode_rows)


def _layer_tail(x: jnp.ndarray, out: jnp.ndarray, wl: Params,
                cfg: ModelConfig, *, mega: bool = False) -> jnp.ndarray:
    """x + out@wo, then the FFN block with its residual.

    ``mega`` (draft forwards only — see quantization.quant_layer_tail for
    the parity rationale): attempt the ONE-call fused tail kernel; falls
    back to the _wo_residual + _mlp(residual=) pair."""
    if mega and is_quantized(wl.get("wo")) and wl.get("w13") is not None:
        B, t = out.shape[:2]
        a = out.reshape(B, t, cfg.n_head * cfg.head_dim)
        y = quant_layer_tail(a, x, wl["wo"], wl["w13"], wl["w2"],
                             (wl["ffn_norm"], cfg.norm_eps))
        if y is not None:
            return y
    h = _wo_residual(x, out, wl, cfg)
    return _mlp(h, wl, cfg, residual=h)


def fuse_exec_params(params: Params, cfg: ModelConfig) -> Params:
    """Single-device execution layout: wq|wk|wv -> wqkv and w1|w3 -> w13,
    concatenated along the output axis so each layer runs one QKV dot and one
    gate/up dot instead of five (the reference stores wqkv fused too,
    Engine/SnapKV/model.py:326; we store them separate for GSPMD head
    sharding and fuse only on meshless engines).  Bit-identical: a dot's
    output columns contract independently, so concatenation changes nothing
    numerically.  Dense and QuantizedWeight leaves both fuse (quantized data
    and per-output scales concat along the output axis; group structure along
    the shared contraction axis is unchanged)."""
    if not isinstance(params, dict) or "layers" not in params:
        return params  # degenerate/partial pytrees (config-validation tests)
    L = dict(params["layers"])
    if L.get("wqkv") is not None or L.get("w13") is not None:
        return params

    def cat(*ws):
        if any(is_quantized(w) for w in ws):
            w0 = ws[0]
            assert all(is_quantized(w) and w.bits == w0.bits
                       and w.group_size == w0.group_size for w in ws), \
                "fusing quantized weights requires identical quant configs"
            return QuantizedWeight(
                q=jnp.concatenate([w.q for w in ws], axis=-1),
                scale=jnp.concatenate([w.scale for w in ws], axis=-1),
                bits=w0.bits, group_size=w0.group_size)
        return jnp.concatenate(ws, axis=-1)

    L["wqkv"] = cat(L.pop("wq"), L.pop("wk"), L.pop("wv"))
    bq, bk, bv = L.pop("bq", None), L.pop("bk", None), L.pop("bv", None)
    L["bqkv"] = (jnp.concatenate([bq, bk, bv], axis=-1)
                 if bq is not None else None)
    L["w13"] = cat(L.pop("w1"), L.pop("w3"))
    return dict(params, layers=L)


# ---------------------------------------------------------------------------
# Layer skeleton
# ---------------------------------------------------------------------------

# An AttnHook maps (RAW x, layer weights, FULL stacked caches, layer idx)
# -> (attn_out, new stacked caches, per-layer rows to append post-scan),
# where attn_out is the RAW attend output [B, T, Hq, hd] (pre-wo): the scan
# body owns the whole layer tail (_layer_tail — wo + residual + FFN +
# residual, fused into kernel epilogues / one mega-call on the draft path).
# Decode-path hooks leave caches untouched and return the layer's new KV as
# ``rows`` (collected as scan ys and appended ONCE after the scan); prefill
# hooks that must mutate caches between layers return updated caches and
# rows=None.  The surrounding skeleton owns projections, norms, residuals and
# the MLP.
AttnHook = Callable[[jnp.ndarray, Params, Caches, jnp.ndarray],
                    Tuple[jnp.ndarray, Caches, Any]]


def scan_layers(params: Params, cfg: ModelConfig, x: jnp.ndarray, caches: Caches,
                layer_attn: AttnHook, *, mega_tail: bool = False):
    """Run all layers with one lax.scan.  caches: pytree of [L, ...] arrays.

    Caches ride in the scan *carry* (usually unmodified — passing them through
    keeps a data dependence so the post-scan batched append can update them in
    place) and hooks attend through layer-indexed kernels
    (ops.attention.attend_cache) with the layer's fresh KV as separate
    operands.  The alternatives are full HBM copies: materialising a
    [B, S, K] layer slice for a custom-call operand costs ~4 full-cache
    passes per forward (int8 decode step at 8k ctx: 55ms), and a per-layer
    scatter interleaved with kernel reads of the same buffer costs ~12
    (320ms) — the read-only scan + one batched append runs the same step in
    ~25ms.  Returns (x, caches, rows) with rows layer-stacked [L, ...].
    """

    def body(carry, wl):
        x, caches, l = carry
        # hooks receive RAW x and return the raw attend output; the body
        # owns the layer tail (pre-norms live inside _qkv/_mlp/_layer_tail
        # so the quantized path can sink ALL the stranded elementwise work
        # into the dequant-dot kernels)
        out, caches, rows = layer_attn(x, wl, caches, l)
        out_x = _layer_tail(x, out, wl, cfg, mega=mega_tail)
        return (out_x, caches, l + 1), rows

    (x, new_caches, _), rows = jax.lax.scan(
        body, (x, caches, jnp.zeros((), jnp.int32)), params["layers"],
        unroll=_SCAN_UNROLL)
    return x, new_caches, rows


def head_argmax(params: Params, cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Final norm + lm head + greedy argmax -> int32 [B, T]."""
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = head_logits(params, x, rows_hint=cfg.decode_rows)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def head_logits(params: Params, x_normed: jnp.ndarray,
                rows_hint: int = 0) -> jnp.ndarray:
    """rows_hint: ModelConfig.decode_rows on target decode/verify passes —
    a QUANTIZED head's kernel routing must be M-invariant like every other
    target dot (verify M=B*(gamma+1) vs baseline M=B, see config.py); the
    dense head keeps the XLA dot (already row-invariant, and at [M, D] x
    [D, V] the dot is weight-bandwidth-bound with nothing to fuse)."""
    if params.get("lm_head") is not None:
        w = params["lm_head"]
        if is_quantized(w):
            return quant_matmul(x_normed, w, rows_hint=rows_hint)
        return x_normed @ w
    embed = params["embed"]
    if is_quantized(embed):  # stored [D, V] (quantization.quantize_embed)
        return quant_matmul(x_normed, embed, rows_hint=rows_hint)
    return x_normed @ embed.T  # tied embeddings (llama-3.2-1b)


def embed_lookup(params: Params, tokens: jnp.ndarray,
                 dtype=None) -> jnp.ndarray:
    """Input embedding rows for [B, T] tokens.

    A quantized table (quantization.quantize_embed) is stored TRANSPOSED
    [D, V] with per-vocab-column scales: token t's embedding is column t
    times scale[0, t]; gathered int8 then dequantized, so the bf16 table
    (~0.5 GB at llama-3 vocab) never exists in HBM."""
    embed = params["embed"]
    if is_quantized(embed):
        cols = jnp.take(embed.q, tokens, axis=1)            # [D, B, T] int8
        x = jnp.moveaxis(cols, 0, -1).astype(jnp.float32)   # [B, T, D]
        s = embed.scale[0][tokens]                          # [B, T]
        if dtype is None:
            dtype = params["final_norm"].dtype
        return (x * s[..., None].astype(jnp.float32)).astype(dtype)
    return embed[tokens]


def head_sample(params: Params, cfg: ModelConfig, x: jnp.ndarray,
                sample: Dict[str, Any]) -> jnp.ndarray:
    """Final norm + lm head + Gumbel-coupled categorical sample -> int32 [B, T].

    ``sample``: {'key': PRNG key, 'salt': [B] int32, 'idx': [B, T] int32
    output-stream indices, 'temperature': float, 'top_p': float}.  See
    ops.sampling.coupled_gumbel — the shared per-position noise is what makes
    speculative *sampling* exact under the greedy-match acceptance rule.
    """
    from magicdec_tpu.ops import sampling as S

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = head_logits(params, x, rows_hint=cfg.decode_rows)
    return S.gumbel_sample_tokens(logits, sample["key"], sample["salt"],
                                  sample["idx"],
                                  temperature=sample["temperature"],
                                  top_p=sample["top_p"])


# ---------------------------------------------------------------------------
# Forward variants
# ---------------------------------------------------------------------------


def _attn_project(x: jnp.ndarray, wl: Params, cfg: ModelConfig,
                  cs_q, cs_k):
    """Pre-norm + projections + rope (the norm applies inside _qkv).
    cs_*: precomputed (cos, sin) [B, T, head_dim//2] — positions are
    layer-invariant, so forwards build them ONCE outside the layer scan
    (rope_cos_sin; lax.scan does not hoist xs-invariant transcendentals).
    cs_k=None leaves k un-roped (StreamingLLM draft prefill stores raw keys,
    reference Engine/StreamingLLM/model.py:402-419)."""
    q, k, v = _qkv(x, wl, cfg)
    q = apply_rope_cs(q, *cs_q)
    if cs_k is not None:
        k = apply_rope_cs(k, *cs_k)
    return q, k, v


def forward_generic(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                    caches: Caches, attn_hook_builder, *, return_logits: bool = False,
                    head: str = None, sample: Optional[Dict[str, Any]] = None,
                    finalize=None, mega_tail: bool = False):
    """Shared driver: embed -> scan(layers with hook) -> finalize -> head.

    attn_hook_builder(cfg, inv_freq) must return an AttnHook
    (x, wl, caches, l) -> (attn_out, caches, rows); the attention pre-norm
    applies inside _qkv (fused into the quantized dot on the pallas path).
    finalize(caches, rows): post-scan batched cache append (rows are the
    scan-stacked [L, ...] per-layer outputs).
    head: 'argmax' (default) | 'logits' | 'none' (returns final hidden states,
    used by prefill chunks whose logits nobody reads).
    sample: Gumbel-coupled sampling spec (see head_sample); replaces the
    'argmax' head with an exact categorical sample when set.
    """
    if head is None:
        head = "logits" if return_logits else "argmax"
    inv_freq = rope_inv_freq(cfg)
    x = embed_lookup(params, tokens)
    layer_attn = attn_hook_builder(cfg, inv_freq)
    x, new_caches, rows = scan_layers(params, cfg, x, caches, layer_attn,
                                      mega_tail=mega_tail)
    if finalize is not None:
        new_caches = finalize(new_caches, rows)
    if head == "logits":
        x = rms_norm(x, params["final_norm"], cfg.norm_eps)
        return head_logits(params, x, rows_hint=cfg.decode_rows), new_caches
    if head == "none":
        return x, new_caches
    if sample is not None:
        return head_sample(params, cfg, x, sample), new_caches
    return head_argmax(params, cfg, x), new_caches


def forward_target(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                   base_lens: jnp.ndarray, caches: Caches, *,
                   return_logits: bool = False, head: str = None,
                   backend: str = "jnp", sample=None):
    """Decode / verify (without draft refresh) / prefill chunk on a full cache.

    tokens [B, T]; base_lens [B] = visible cache length before this call.
    caches: {'k': [L,B,Hkv,S,hd], 'v': ...}.  Positions are real:
    base_lens + arange(T).  Equivalent to reference Transformer.forward /
    StreamingLLM Transformer.verify / prefill (Engine/SnapKV/model.py:171-245).
    """
    T = tokens.shape[1]
    pos = base_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]

    def builder(cfg, inv_freq):
        cs = rope_cos_sin(pos, inv_freq)  # once, outside the layer scan

        def hook(x, wl, caches, l):
            q, k, v = _attn_project(x, wl, cfg, cs, cs)
            out, rows = _target_attend(q, k, v, caches, l, base_lens,
                                       backend=backend)
            return out, caches, rows
        return hook

    finalize = functools.partial(_target_finalize, base_lens=base_lens,
                                 backend=backend)
    return forward_generic(params, cfg, tokens, caches, builder,
                           return_logits=return_logits, head=head,
                           sample=sample, finalize=finalize)


def _kv_rows(k, v, caches, prefix=""):
    """The layer's new KV in the cache's at-rest format (dense cache dtype,
    or quantized data + per-(token, head) scales).  These exact rows are BOTH
    the kernels' fresh-token operands and what gets appended post-scan, so
    attention numerics are identical to attending over the appended cache.
    """
    kc = caches[prefix + "k"]
    if (prefix + "ks") in caches and caches.get(prefix + "ks") is not None:
        Hkv, hd = k.shape[2], k.shape[3]
        qz = (kv_ops.quantize_kv_tokens_int4
              if kc.shape[3] == (Hkv // 2) * hd
              else kv_ops.quantize_kv_tokens)
        sdt = caches[prefix + "ks"].dtype  # f32 or bf16 (kv_scale_dtype)
        kq, ksn = qz(k, scale_dtype=sdt)
        vq, vsn = qz(v, scale_dtype=sdt)
        return {"k": kq, "v": vq, "ks": ksn, "vs": vsn}
    B, T = k.shape[:2]
    return {"k": k.reshape(B, T, -1).astype(kc.dtype),
            "v": v.reshape(B, T, -1).astype(kc.dtype)}


def _append_rows(caches, rows, write_pos, prefix="", backend="jnp"):
    """Batched post-scan append of scan-stacked rows [L, B, T, ...].

    On the flash path the append is ONE aliased in-place pallas RMW over all
    cache arrays (kv_ops.append_all_rows_inplace) — a jnp scatter forces XLA
    to insert a defensive full-cache copy (time AND peak-memory) because the
    attention custom calls read the same buffer within the step, and separate
    per-array calls repeat the (L, B, blocks) grid of tiny DMAs 2-4x.
    Under a mesh (backend = ops.shard.FlashShard) the same aliased RMW runs
    per shard via shard_map."""
    from magicdec_tpu.ops.shard import FlashShard

    if caches.get(prefix + "table") is not None:
        return _append_rows_paged(caches, rows, write_pos, prefix=prefix,
                                  backend=backend)
    if isinstance(backend, FlashShard):
        from magicdec_tpu.ops import shard as shard_ops

        quant = "ks" in rows
        out_arrays = shard_ops.append_all_rows_sharded(
            backend, caches[prefix + "k"], caches[prefix + "v"],
            rows["k"], rows["v"], write_pos,
            *((caches[prefix + "ks"], caches[prefix + "vs"],
               rows["ks"], rows["vs"]) if quant else ()))
        out = {prefix + "k": out_arrays[0], prefix + "v": out_arrays[1]}
        if quant:
            out[prefix + "ks"] = out_arrays[2]
            out[prefix + "vs"] = out_arrays[3]
        return {**caches, **out}
    if backend == "flash":
        import os

        from magicdec_tpu.ops import pallas as PL

        interp = PL.use_interpret()
        if os.environ.get("MAGICDEC_PER_ARRAY_APPEND"):  # perf A/B switch
            out = {prefix + "k": kv_ops.append_rows_inplace(
                       caches[prefix + "k"], rows["k"], write_pos,
                       interpret=interp),
                   prefix + "v": kv_ops.append_rows_inplace(
                       caches[prefix + "v"], rows["v"], write_pos,
                       interpret=interp)}
            if "ks" in rows:
                out[prefix + "ks"] = kv_ops.append_scale_rows_inplace(
                    caches[prefix + "ks"], rows["ks"], write_pos,
                    interpret=interp)
                out[prefix + "vs"] = kv_ops.append_scale_rows_inplace(
                    caches[prefix + "vs"], rows["vs"], write_pos,
                    interpret=interp)
            return {**caches, **out}
        quant = "ks" in rows
        out_arrays = kv_ops.append_all_rows_inplace(
            caches[prefix + "k"], caches[prefix + "v"],
            rows["k"], rows["v"], write_pos,
            *((caches[prefix + "ks"], caches[prefix + "vs"],
               rows["ks"], rows["vs"]) if quant else (None,) * 4),
            interpret=interp)
        out = {prefix + "k": out_arrays[0], prefix + "v": out_arrays[1]}
        if quant:
            out[prefix + "ks"] = out_arrays[2]
            out[prefix + "vs"] = out_arrays[3]
        return {**caches, **out}
    out = {prefix + "k": kv_ops.append_rows_all_layers(
               caches[prefix + "k"], rows["k"], write_pos),
           prefix + "v": kv_ops.append_rows_all_layers(
               caches[prefix + "v"], rows["v"], write_pos)}
    if "ks" in rows:
        out[prefix + "ks"] = kv_ops.append_scale_rows_all_layers(
            caches[prefix + "ks"], rows["ks"], write_pos)
        out[prefix + "vs"] = kv_ops.append_scale_rows_all_layers(
            caches[prefix + "vs"], rows["vs"], write_pos)
    return {**caches, **out}


def _append_rows_paged(caches, rows, write_pos, prefix="", backend="jnp"):
    """_append_rows when the caches are page POOLS + a ``table`` key
    (engine/serving.PagedServingEngine).  flash: one aliased RMW into the
    pool (ops/pallas/paged_attention.append_paged_rows_inplace); jnp: the
    scatter oracle (CPU tests — a pool scatter copies the pool under jit)."""
    from magicdec_tpu.ops import paged_kv as pkv_ops

    table = caches[prefix + "table"]
    quant = "ks" in rows
    from magicdec_tpu.ops.shard import FlashShard

    if isinstance(backend, FlashShard):
        from magicdec_tpu.ops import shard as shard_ops

        out_arrays = shard_ops.append_paged_rows_sharded(
            backend, caches[prefix + "k"], caches[prefix + "v"],
            rows["k"], rows["v"], write_pos, table,
            *((caches[prefix + "ks"], caches[prefix + "vs"],
               rows["ks"], rows["vs"]) if quant else ()))
        out = {prefix + "k": out_arrays[0], prefix + "v": out_arrays[1]}
        if quant:
            out[prefix + "ks"] = out_arrays[2]
            out[prefix + "vs"] = out_arrays[3]
        return {**caches, **out}
    if backend == "flash":
        from magicdec_tpu.ops import pallas as PL
        from magicdec_tpu.ops.pallas import paged_attention as PGA

        out_arrays = PGA.append_paged_rows_inplace(
            caches[prefix + "k"], caches[prefix + "v"],
            rows["k"], rows["v"], write_pos, table,
            *((caches[prefix + "ks"], caches[prefix + "vs"],
               rows["ks"], rows["vs"]) if quant else (None,) * 4),
            interpret=PL.use_interpret())
        out = {prefix + "k": out_arrays[0], prefix + "v": out_arrays[1]}
        if quant:
            out[prefix + "ks"] = out_arrays[2]
            out[prefix + "vs"] = out_arrays[3]
        return {**caches, **out}
    out = {prefix + "k": pkv_ops.append_paged_rows_all_layers(
               caches[prefix + "k"], rows["k"], write_pos, table),
           prefix + "v": pkv_ops.append_paged_rows_all_layers(
               caches[prefix + "v"], rows["v"], write_pos, table)}
    if quant:
        out[prefix + "ks"] = pkv_ops.append_paged_scale_rows_all_layers(
            caches[prefix + "ks"], rows["ks"], write_pos, table)
        out[prefix + "vs"] = pkv_ops.append_paged_scale_rows_all_layers(
            caches[prefix + "vs"], rows["vs"], write_pos, table)
    return {**caches, **out}


def _target_finalize(caches, rows, *, base_lens, backend="jnp"):
    return _append_rows(caches, rows, base_lens, backend=backend)


def _target_attend(q, k, v, caches, l, base_lens, *, backend):
    """Attend layer l of the stacked target cache (bf16, int8, or
    int4-packed) WITHOUT appending: the layer's new KV rides as fresh-token
    kernel operands and is returned as ``rows`` for the post-scan batched
    append (see scan_layers — this is what keeps the cache copy-free).
    """
    rows = _kv_rows(k, v, caches)
    out = attn_ops.attend_cache(q, caches, base_lens, layer=l, backend=backend,
                                fresh=rows)
    return out, rows


def forward_verify_snapkv(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                          base_lens: jnp.ndarray, draft_fill: jnp.ndarray,
                          caches: Caches, *, backend: str = "jnp",
                          sample=None):
    """SnapKV self-spec verify: target attention + dual append.

    Appends the (real-position-roped) k,v of the gamma+1 window tokens to BOTH
    the target cache (at base_lens) and the draft cache (at draft_fill,
    overwriting the gamma slots the draft speculated) — reference
    Engine/SnapKV/model.py:338-353 + backend.py:181-197.
    caches: {'k','v','dk','dv'}.
    """
    T = tokens.shape[1]
    pos = base_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]

    def builder(cfg, inv_freq):
        cs = rope_cos_sin(pos, inv_freq)  # once, outside the layer scan

        def hook(x, wl, caches, l):
            q, k, v = _attn_project(x, wl, cfg, cs, cs)
            out, rows = _target_attend(q, k, v, caches, l, base_lens,
                                       backend=backend)
            # draft cache stays bf16 (it is budget-sized, not bandwidth-bound)
            drows = _kv_rows(k, v, caches, prefix="d")
            return out, caches, {"t": rows, "d": drows}
        return hook

    def finalize(caches, rows):
        caches = _append_rows(caches, rows["t"], base_lens, backend=backend)
        return _append_rows(caches, rows["d"], draft_fill, prefix="d",
                            backend=backend)

    return forward_generic(params, cfg, tokens, caches, builder, sample=sample,
                           finalize=finalize)


def forward_prefill_snapkv_last(params: Params, cfg: ModelConfig,
                                tokens: jnp.ndarray, base_lens: jnp.ndarray,
                                caches: Caches, *, ctx_len: int, window: int,
                                budget: int, kernel_size: int = 5,
                                pooling: str = "avgpool", backend: str = "jnp",
                                head: str = None, sample=None):
    """Last SnapKV prefill chunk: target append + attention + draft-KV build.

    tokens [B, window] (the reference constrains the last chunk to be exactly
    the observation window, tests/SnapKV/selfspec_benchmark.py:37-40).
    ctx_len = static total prefix length after this chunk.
    caches: {'k','v','dk','dv'}.  The compressed draft set fills draft slots
    [0, budget); reference Engine/SnapKV/model.py:381-439.
    """
    from magicdec_tpu.ops.snapkv import snapkv_compress

    T = tokens.shape[1]
    pos = base_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]

    def builder(cfg, inv_freq):
        cs = rope_cos_sin(pos, inv_freq)  # once, outside the layer scan

        def hook(x, wl, caches, l):
            q, k, v = _attn_project(x, wl, cfg, cs, cs)
            out, rows = _target_attend(q, k, v, caches, l, base_lens,
                                       backend=backend)
            # compression scores/gathers need this layer's KV including the
            # window; the slice is prefill-only.  Quantized caches stay
            # quantized here — snapkv_compress dequantizes PER REQUEST
            # inside its batch scan (a whole-batch dense dequant is a
            # 2+ GiB transient at 32k/B=32, the round-5 OOM; values are
            # bit-identical either way)
            kc = jax.lax.dynamic_index_in_dim(caches["k"], l, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(caches["v"], l, 0, keepdims=False)
            kc = attn_ops._dus_rows(kc, rows["k"], base_lens)
            vc = attn_ops._dus_rows(vc, rows["v"], base_lens)
            ks = vs = None
            if "ks" in caches:
                ks = jax.lax.dynamic_index_in_dim(caches["ks"], l, 0, keepdims=False)
                vs = jax.lax.dynamic_index_in_dim(caches["vs"], l, 0, keepdims=False)
                ks = attn_ops._dus_scale_rows(ks, rows["ks"], base_lens)
                vs = attn_ops._dus_scale_rows(vs, rows["vs"], base_lens)
            q_win = q[:, -window:]
            dk_new, dv_new = snapkv_compress(
                q_win, kc, vc, ctx_len=ctx_len, window=window, budget=budget,
                kernel_size=kernel_size, pooling=pooling,
                k_scale=ks, v_scale=vs)
            Bq = q_win.shape[0]
            drows = {"dk": dk_new.reshape(Bq, budget, -1).astype(caches["dk"].dtype),
                     "dv": dv_new.reshape(Bq, budget, -1).astype(caches["dv"].dtype)}
            return out, caches, {"t": rows, "d": drows}
        return hook

    def finalize(caches, rows):
        caches = _append_rows(caches, rows["t"], base_lens, backend=backend)
        # compressed draft sets fill slots [0, budget) of every layer at once
        dk = caches["dk"].at[:, :, :budget].set(rows["d"]["dk"])
        dv = caches["dv"].at[:, :, :budget].set(rows["d"]["dv"])
        return {**caches, "dk": dk, "dv": dv}

    return forward_generic(params, cfg, tokens, caches, builder, head=head,
                           sample=sample, finalize=finalize)


def forward_prefill_snapkv_window(params: Params, cfg: ModelConfig,
                                  tokens: jnp.ndarray, base_lens: jnp.ndarray,
                                  caches: Caches, *, backend: str = "jnp"):
    """The snapkv observation-window chunk WITHOUT the compression: target
    forward + append, collecting each layer's roped window queries.

    Returns (x [B, W, D] final hidden states, caches with the window
    appended, qs [L, B, W, Hq*hd]).  The split snapkv encode runs the
    compression afterwards as per-layer bounded device calls
    (engine._snapkv_layer_compress_fn): at 32k/B=32 the compress traffic is
    ~14 GB PER LAYER (the [Hkv, G, W, ctx] score tensors), so one call
    doing all layers x requests executes for minutes and hard-crashes the
    remote worker (the round-3 per-call execution limit).  Values are
    bit-identical to forward_prefill_snapkv_last: the compression there
    reads exactly these queries and the post-append cache content.
    """
    T = tokens.shape[1]
    pos = base_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    inv_freq = rope_inv_freq(cfg)
    x = embed_lookup(params, tokens)
    cs = rope_cos_sin(pos, inv_freq)

    def hook(xh, wl, caches, l):
        q, k, v = _attn_project(xh, wl, cfg, cs, cs)
        out, rows = _target_attend(q, k, v, caches, l, base_lens,
                                   backend=backend)
        B, W = q.shape[:2]
        return out, caches, {"t": rows, "q": q.reshape(B, W, -1)}

    x, caches, rows = scan_layers(params, cfg, x, caches, hook)
    caches = _append_rows(caches, rows["t"], base_lens, backend=backend)
    return x, caches, rows["q"]


def forward_streaming_draft_chunk(params: Params, cfg: ModelConfig,
                                  tokens: jnp.ndarray, fill: jnp.ndarray,
                                  caches: Caches, *, budget: int, sink: int):
    """One StreamingLLM draft-prefill chunk (raw-key storage + slot re-rope).

    tokens [B, C]; fill: scalar int32 = min(tokens so far, budget).
    caches: {'dk','dv'} raw-key draft buffers [L,B,Hkv,Sd,hd].
    Reference Engine/StreamingLLM/model.py:115-157, 402-419.
    Returns (final hidden states, caches) — draft prefill logits are unread.
    """
    from magicdec_tpu.ops.streamingllm import stream_update_raw

    C = tokens.shape[1]
    B = tokens.shape[0]
    vis = jnp.minimum(fill + C, budget)
    base = jnp.broadcast_to((vis - C)[None], (B,))
    # q roped at real positions while growing, clamped to the window once full
    # (reference model.py:409-412)
    pos_q = base[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
    slot_pos = jnp.arange(budget, dtype=jnp.int32)

    def builder(cfg, inv_freq):
        cs_q = rope_cos_sin(pos_q, inv_freq)
        cs_slot = rope_cos_sin(slot_pos[None], inv_freq)

        def hook(x, wl, caches, l):
            # prefill-only path: the eviction/re-rope logic works on this
            # layer's slice of the (budget-sized) draft cache; slice copies
            # here are cheap and nothing feeds a custom call
            q, k, v = _attn_project(x, wl, cfg, cs_q, None)
            dk_l = jax.lax.dynamic_index_in_dim(caches["dk"], l, 0, keepdims=False)
            dv_l = jax.lax.dynamic_index_in_dim(caches["dv"], l, 0, keepdims=False)
            dk, dv, _, _ = stream_update_raw(dk_l, dv_l, k, v,
                                             fill, budget=budget, sink=sink)
            hd = cfg.head_dim
            kv_heads = dk.shape[2] // hd
            k_att = apply_rope_cs(
                dk[:, :budget].reshape(B, budget, kv_heads, hd),
                *cs_slot)  # roped at slot positions
            out = attn_ops.attend(q, k_att.reshape(B, budget, -1),
                                  dv[:, :budget], base, causal=True)
            caches = {**caches,
                      "dk": jax.lax.dynamic_update_index_in_dim(
                          caches["dk"], dk.astype(caches["dk"].dtype), l, 0),
                      "dv": jax.lax.dynamic_update_index_in_dim(
                          caches["dv"], dv.astype(caches["dv"].dtype), l, 0)}
            return out, caches, None
        return hook

    return forward_generic(params, cfg, tokens, caches, builder, head="none")


def streaming_finalize_draft(cfg: ModelConfig, caches: Caches, *, budget: int):
    """Persist the slot-roped draft cache after the last prefill chunk
    (reference Engine/StreamingLLM/model.py:155-157)."""
    inv_freq = rope_inv_freq(cfg)
    slot_pos = jnp.arange(budget, dtype=jnp.int32)[None]
    hd = cfg.head_dim

    def rope_layer(dk_layer):  # [B, Sd, Hkv*hd]
        B, _, K = dk_layer.shape
        roped = apply_rope(dk_layer[:, :budget].reshape(B, budget, K // hd, hd),
                           slot_pos, inv_freq)
        return dk_layer.at[:, :budget].set(
            roped.reshape(B, budget, K).astype(dk_layer.dtype))

    dk = jax.vmap(rope_layer)(caches["dk"])
    return {"dk": dk, "dv": caches["dv"]}


def forward_draft(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                  draft_fill: jnp.ndarray, rope_pos: jnp.ndarray, caches: Caches,
                  *, backend: str = "jnp", sample=None):
    """Draft decode step over the compressed cache.

    draft_fill [B]: cache fill (append position & causal base).
    rope_pos [B]: rope position of the first token — real positions for SnapKV
    (reference backend.py:199-229 passes draft_cachelens == target cachelens),
    slot positions (== draft_fill) for StreamingLLM.
    caches: {'dk','dv'}.
    """
    T = tokens.shape[1]
    pos = rope_pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]

    def builder(cfg, inv_freq):
        cs = rope_cos_sin(pos, inv_freq)  # once, outside the layer scan

        def hook(x, wl, caches, l):
            q, k, v = _attn_project(x, wl, cfg, cs, cs)
            rows = _kv_rows(k, v, caches, prefix="d")
            out = attn_ops.attend_cache(q, caches, draft_fill, layer=l,
                                        backend=backend, prefix="d",
                                        fresh=rows)
            return out, caches, rows
        return hook

    def finalize(caches, rows):
        return _append_rows(caches, rows, draft_fill, prefix="d",
                            backend=backend)

    # mega_tail: the one-call fused wo+FFN tail is DRAFT-ONLY (see
    # quantization.quant_layer_tail for the target-parity rationale)
    return forward_generic(params, cfg, tokens, caches, builder, sample=sample,
                           finalize=finalize, mega_tail=True)
