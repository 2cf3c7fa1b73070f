"""Weight-only quantization: INT8 and INT4, per-output-channel symmetric.

Capability port of Engine/quantize.py (reference: INT8 only,
``dynamically_quantize_per_channel`` :7-39 + cast-matmul forward :86-87),
extended with INT4 per the north-star (BASELINE.json).  A quantized weight is
a dict leaf ``{"q": int8[..., in, out] (or packed int4), "scale":
f32[..., out], "bits": ()}`` that the model's ``matmul`` dispatches on; the
jnp path dequantizes into the matmul (XLA fuses the cast), and
magicdec_tpu.ops.pallas provides the fused dequant+matmul kernel for the hot
path.

Activated like the reference via checkpoint-path convention ("int8"/"int4" in
the name, Engine/utils.py:201-205) or explicitly via ``quantize_params``.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3",
              "wqkv", "w13")  # fused execution layout (models.llama.fuse_exec_params)

# "jnp": cast-matmul fused by XLA; "pallas": fused dequant+matmul kernel
# (ops/pallas/quant_matmul.py).  Module-level because the dispatch happens
# inside jitted model code.
_MATMUL_BACKEND = "jnp"

# DENSE (bf16) fused kernels are OFF by default: measured on v5e (round 5,
# 16-layer 1B-shape dense stack, end-to-end on-chip chains), XLA's dots run
# at ~82% of HBM bandwidth (2.88 ms vs the 2.37 ms weight-stream floor at
# M=160) while the pallas dense kernels reach only ~50% (4.60 ms) — the
# round-4 "~2.6 ms dense-path overhead" hypothesis did not survive direct
# measurement; the noctx gap lives in attend@len~0/append/embed/glue, not
# the dense dots.  The kernels + dispatch stay for A/B (set_dense_kernels)
# and as the template the QUANT path's measured wins are built on.
_DENSE_KERNELS = False


def set_dense_kernels(on: bool) -> None:
    global _DENSE_KERNELS
    _DENSE_KERNELS = bool(on)


def set_matmul_backend(name: str) -> None:
    global _MATMUL_BACKEND
    assert name in ("jnp", "pallas"), name
    _MATMUL_BACKEND = name


@flax.struct.dataclass
class QuantizedWeight:
    """q: int8 [..., in, out] (int4: packed [..., in//2, out]);
    scale: f32 [..., n_groups, out] where groups tile the contraction axis
    (n_groups == 1 reproduces the reference's per-output-channel scheme,
    quantize.py:7-39).  bits/group_size are static so lax.scan over stacked
    layers carries only the arrays."""

    q: jnp.ndarray
    scale: jnp.ndarray
    bits: int = flax.struct.field(pytree_node=False, default=8)
    group_size: int = flax.struct.field(pytree_node=False, default=0)  # 0 = whole column


def is_quantized(w: Any) -> bool:
    return isinstance(w, QuantizedWeight)


def quantize_weight(w: jnp.ndarray, bits: int = 8,
                    group_size: int = None) -> QuantizedWeight:
    """Symmetric quantization of [..., in, out] weights.

    int8 defaults to per-output-channel scales (reference parity); int4
    defaults to group-wise scales (group_size=128 when the contraction axis
    allows, else one group) per the QServe/GPTQ-style recipe — plain
    per-channel int4 loses ~10% relative error per matmul on gaussian weights.
    """
    In = w.shape[-2]
    if group_size is None:
        group_size = In
        if bits == 4:
            for g in (128, 64, 32):
                if In % g == 0:
                    group_size = g
                    break
    assert In % group_size == 0
    G = In // group_size
    wf = w.astype(jnp.float32)
    grouped = wf.reshape(*w.shape[:-2], G, group_size, w.shape[-1])
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True) / qmax
    scale = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(grouped / scale), -qmax - 1, qmax)
    q = q.reshape(*w.shape[:-2], In, w.shape[-1]).astype(jnp.int8)
    if bits == 4:
        q = pack_int4(q)
    return QuantizedWeight(q=q, scale=scale[..., 0, :].astype(jnp.float32),
                           bits=bits, group_size=group_size)


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int8 values in [-8, 7] pairwise along the contraction axis
    (even rows -> low nibble) into int8 [..., in//2, out]."""
    assert q.shape[-2] % 2 == 0
    lo = q[..., 0::2, :] & 0xF
    hi = q[..., 1::2, :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4 -> int8 [..., in, out] with sign extension."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-2)  # [..., in//2, 2, out]
    return out.reshape(*packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1])


def dequantize_weight(wq: QuantizedWeight, dtype=jnp.bfloat16) -> jnp.ndarray:
    q = wq.q
    if wq.bits == 4:
        q = unpack_int4(q)
    In, out = q.shape[-2], q.shape[-1]
    G = wq.scale.shape[-2]
    grouped = q.reshape(*q.shape[:-2], G, In // G, out).astype(jnp.float32)
    deq = grouped * wq.scale[..., :, None, :]
    return deq.reshape(*q.shape[:-2], In, out).astype(dtype)


def _rms_norm(x, w, eps):
    """models.llama.rms_norm twin (kept local — llama imports this module)."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return n.astype(x.dtype) * w


def _in_block_cap(In: int) -> int:
    for cand in (2048, 1024, 512):
        if In % cand == 0:
            return cand
    return In


def _pick_block_out(F: int, rows: int, block_in: int, In: int,
                    w_bytes_per_out: float, norm: bool) -> int:
    """Widest output block whose per-call VMEM stays under budget, or 0.

    Budget accounts for BOTH the (double-buffered) streamed weight block and
    the M-dependent row-resident arrays (x block, f32 accumulator, output
    block, norm scratch), sized at ``rows`` — the routing row count, not the
    live M — so a baseline (M = B) and a verify (M = B * (gamma + 1)) pass
    pick the SAME blocking (ADVICE r4: an M-blind budget admitted shapes that
    AOT-reject at 16 MiB scoped VMEM)."""
    fixed = rows * (2 * block_in * 2)          # x block, double-buffered bf16
    if norm:
        fixed += rows * In * 2                 # normalized-rows VMEM scratch
    # 9 MiB model budget ≈ 16 MiB real scoped VMEM: the model undercounts
    # the in-kernel bf16 weight cast and output double-buffer by ~40%
    # (calibrated on the AOT reject at rows=512, In=8192, bo=1024: model
    # 11.3 MiB vs real 16.11 MiB; bo=512 compiles).  Known-good blockings
    # (rows<=256 ladder shapes) are unchanged under this budget.
    budget = 9 * 1024 * 1024
    for bo in (8192, 4096, 3072, 2048, 1536, 1024, 768, 512, 384, 256):
        if F % bo:
            continue
        if bo * w_bytes_per_out > 2 * 1024 * 1024 and bo > 256:
            continue  # streamed weight blocks ~<= 2 MiB (measured-good cap)
        vmem = fixed + 2 * bo * w_bytes_per_out + rows * bo * 6
        if vmem <= budget:
            return bo
    return 0


def quant_matmul(x: jnp.ndarray, wq: QuantizedWeight, norm=None,
                 gate: bool = False, residual=None,
                 rows_hint: int = 0) -> jnp.ndarray:
    """x [..., in] @ dequant(wq) — jnp reference path (cast fused by XLA).

    Matches the reference forward ``F.linear(x, w.to(x.dtype)) * scales``
    (quantize.py:86-87): per-output-channel scaling commutes with the
    contraction, so scale applies to the output.

    ``norm``: optional (weight, eps) — rms-norm x first (fused in-kernel on
    the pallas decode path; the surrounding [M, D] elementwise kernels are
    pure fixed cost there).  ``gate``: wq is the fused gate|up projection
    [In, 2F]; returns silu(x @ w_gate) * (x @ w_up) [..., F].
    ``residual``: optional [..., Out] array ADDED to the output (fused into
    the kernel's finish epilogue on the pallas path — the layer's residual
    add is otherwise a stranded elementwise dispatch at decode shapes).
    ``rows_hint``: > 0 on TARGET decode/verify paths (ModelConfig.decode_rows
    — see config.py): kernel routing and blocking derive from this instead of
    the live M, so verify and baseline rows stay bit-identical.
    """
    assert not (gate and residual is not None)
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    rows = rows_hint or M
    if (norm is not None or gate or residual is not None) \
            and _MATMUL_BACKEND == "pallas" and wq.q.ndim == 2:
        from magicdec_tpu.ops import pallas as PL
        from magicdec_tpu.ops.pallas.quant_matmul import quant_matmul_fused_pallas

        In = wq.q.shape[0] * (2 if wq.bits == 4 else 1)
        Out = wq.q.shape[1]
        F = Out // 2 if gate else Out
        # rows cap 256: measured on v5e (round 5) — raising it to 512 so
        # the B=128 int8-target verify (M=512) takes the kernels made the
        # row SLOWER end-to-end (3731 vs 3882 tok/s): at large M the
        # VMEM-constrained small blocks lose to XLA's dequant-fused dots,
        # the same lesson as the dense-kernel A/B.  Beyond the cap, baseline
        # and verify consistently take the jnp path (rows is the hint).
        if rows <= 256 and M <= rows and In % 512 == 0 and F % 256 == 0:
            block_in = _in_block_cap(In)
            # norm fusion needs the whole contraction in one int8 block (the
            # row statistic); otherwise pre-norm in jnp and fuse only gate
            fuse_norm = (norm is not None and wq.bits == 8
                         and block_in == In)
            w_bytes_per_out = (block_in * (1 if wq.bits == 8 else 0.5)
                               * (2 if gate else 1))
            block_out = _pick_block_out(F, rows, block_in, In,
                                        w_bytes_per_out, fuse_norm)
            if block_out:
                xm = x.reshape(M, In)
                if norm is not None and not fuse_norm:
                    xm = _rms_norm(xm, norm[0], norm[1])
                y = quant_matmul_fused_pallas(
                    xm, wq.q, wq.scale,
                    norm[0] if fuse_norm else None,
                    residual.reshape(M, F) if residual is not None else None,
                    bits=wq.bits, group_size=wq.group_size,
                    block_in=block_in, block_out=block_out,
                    norm=fuse_norm, norm_eps=(norm[1] if fuse_norm else 1e-5),
                    gate=gate, interpret=PL.use_interpret())
                return y.reshape(*lead, F)
    if norm is not None:
        x = _rms_norm(x, norm[0], norm[1])
    if gate:
        y = quant_matmul(x, wq, rows_hint=rows_hint)
        F = y.shape[-1] // 2
        return jax.nn.silu(y[..., :F]) * y[..., F:]
    if residual is not None:
        return residual + quant_matmul(x, wq, rows_hint=rows_hint)
    if _MATMUL_BACKEND == "pallas" and wq.q.ndim == 2:
        from magicdec_tpu.ops import pallas as PL
        from magicdec_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

        In = wq.q.shape[0] * (2 if wq.bits == 4 else 1)
        Out = wq.q.shape[1]
        # the kernel keeps all M rows in VMEM (weights are the streamed
        # operand): decode/verify shapes only — prefill chunks (M = B*C) use
        # the jnp path, where XLA fuses the dequant cast into the matmul.
        # ``rows`` (the decode_rows hint when set, else the live M) must stay
        # <= ~256: the kernel keeps all M rows of x AND an [M, block_out]
        # f32 accumulator in VMEM, so prefill-sized M (e.g. the 8B draft
        # prefill's B=8 x C=128 = 1024 rows) compiles 4 MiB over the limit.
        if rows <= 256 and M <= rows and In % 512 == 0 and Out % 256 == 0:
            # Blocking: whole contraction per block when it fits (one
            # accumulator pass; capped at 2048 rows — In=14336 as one block
            # compiles to 36 MiB of scoped VMEM), then the widest output
            # block that keeps one streamed weight block ~<= 2 MiB.  Small
            # blocks are the draft step's dominant cost: a [32,512]x[512,512]
            # step moves 256 KB per ~1.5 us of grid fixed cost (the measured
            # ~2x draft roofline gap, COVERAGE.md).  _pick_block_out also
            # vetoes combinations whose ROW-resident VMEM (sized at ``rows``,
            # not M) would blow the scoped limit.
            block_in = _in_block_cap(In)
            w_bytes_per_out = block_in * (1 if wq.bits == 8 else 0.5)
            block_out = _pick_block_out(Out, rows, block_in, In,
                                        w_bytes_per_out, False)
            if block_out:
                y = quant_matmul_pallas(x.reshape(M, In), wq.q, wq.scale,
                                        bits=wq.bits, group_size=wq.group_size,
                                        block_in=block_in, block_out=block_out,
                                        interpret=PL.use_interpret())
                return y.reshape(*lead, Out)
    q = wq.q
    if wq.bits == 4:
        q = unpack_int4(q)
    In, out = q.shape[-2], q.shape[-1]
    G = wq.scale.shape[-2]
    if G == 1:
        y = x @ q.astype(x.dtype)
        return y * wq.scale[..., 0, :].astype(x.dtype)
    # group-wise: dequantize (scale per group) then ONE dot.  The obvious
    # alternative — G per-group dots summed — leaves the MXU at tiny
    # 128-deep contractions and was the dominant cost of int4-weight
    # prefill (the 64 MB dequantized block here is a transient XLA fuses
    # into the dot's weight stream).
    q3 = q.reshape(*q.shape[:-2], G, In // G, out)
    wdeq = (q3.astype(jnp.float32)
            * wq.scale[..., :, None, :]).astype(x.dtype)
    return x @ wdeq.reshape(*q.shape[:-2], In, out)


def quant_mlp(x: jnp.ndarray, w13: QuantizedWeight, w2: QuantizedWeight,
              norm, residual=None, rows_hint: int = 0):
    """Whole FFN block — rms_norm -> silu-gated MLP -> w2 [+ residual] — as
    ONE pallas call (ops/pallas/quant_matmul.quant_mlp_pallas) when shapes
    allow, else ``None`` (caller falls back to the two-call path).

    Requirements: pallas backend, unstacked int8 weights with per-output-
    channel scales (G == 1: the column scales commute with the contraction,
    so per-F-block partials can be scaled and accumulated independently),
    decode-sized M, lane-tiled D that fits one VMEM block, and an F that
    tiles by a 128-multiple block.  At decode shapes each pallas call's fixed
    cost rivals its weight-stream time, so 2 calls + 2 stranded elementwise
    dispatches -> 1 call is the draft scan's main remaining glue cut
    (COVERAGE.md draft anatomy).
    """
    if _MATMUL_BACKEND != "pallas":
        return None
    if not (is_quantized(w13) and is_quantized(w2)):
        return None
    if w13.q.ndim != 2 or w2.q.ndim != 2:
        return None
    if w13.bits != 8 or w2.bits != 8:
        return None
    if w13.scale.shape[0] != 1 or w2.scale.shape[0] != 1:
        return None
    lead = x.shape[:-1]
    D = x.shape[-1]
    F = w13.q.shape[1] // 2
    if w2.q.shape != (F, D):
        return None
    M = 1
    for d in lead:
        M *= d
    rows = rows_hint or M
    # one D-spanning block per dot (the norm's row statistic).  VMEM per
    # grid cell: the double-buffered int8 weight blocks (gate + up [D, bf]
    # and w2 [bf, D] -> 6*D*bf bytes) PLUS the row-resident arrays — x, hn
    # scratch, o, optional res (bf16) and the f32 accumulator — sized at
    # ``rows`` (the decode_rows hint), NOT the live M, so baseline and
    # verify pick identical blocking (ADVICE r4: an M-blind budget admitted
    # M=256 x D=4096 shapes that AOT-reject at the 16 MiB scoped limit).
    if not (rows <= 256 and M <= rows and D % 128 == 0 and D <= 4096):
        return None
    block_f = 0
    for bf in (1024, 768, 512, 384, 256, 128):
        if F % bf == 0 and 6 * D * bf + rows * D * 14 <= 14 * 1024 * 1024:
            block_f = bf
            break
    if not block_f:
        return None
    from magicdec_tpu.ops import pallas as PL
    from magicdec_tpu.ops.pallas.quant_matmul import quant_mlp_pallas

    y = quant_mlp_pallas(
        x.reshape(M, D), w13.q, w13.scale, w2.q, w2.scale, norm[0],
        residual.reshape(M, D) if residual is not None else None,
        block_f=block_f, norm_eps=norm[1], interpret=PL.use_interpret())
    return y.reshape(*lead, D)


def quant_layer_tail(a: jnp.ndarray, x: jnp.ndarray, wo: QuantizedWeight,
                     w13: QuantizedWeight, w2: QuantizedWeight, norm):
    """The whole post-attention layer tail — x + a@wo, then the FFN block
    with its residual — as ONE pallas call when shapes allow, else ``None``.

    DRAFT-PASS ONLY (models.llama passes allow_mega_tail just for draft
    forwards): the F-block count is shape-derived but the target's verify
    (M = B*(gamma+1)) and baseline (M = B) rows must share bit-identical
    numerics for the greedy spec == AR golden contract, and this kernel's
    VMEM budget cannot hold the M=256 worst case at production D — so the
    target path keeps the _wo_residual + quant_mlp pair.  Draft numerics
    only steer acceptance; verification makes committed output exact either
    way (Engine/utils.py:201-205 has the same one-sided-quantization
    semantics).
    """
    if _MATMUL_BACKEND != "pallas":
        return None
    if not all(is_quantized(w) for w in (wo, w13, w2)):
        return None
    if any(w.q.ndim != 2 or w.bits != 8 or w.scale.shape[0] != 1
           for w in (wo, w13, w2)):
        return None
    lead = x.shape[:-1]
    D = x.shape[-1]
    K = a.shape[-1]
    F = w13.q.shape[1] // 2
    if wo.q.shape != (K, D) or w2.q.shape != (F, D):
        return None
    M = 1
    for d in lead:
        M *= d
    if not (M <= 128 and D % 128 == 0 and K % 128 == 0):
        return None
    # VMEM budget: wo resident (K*D) + double-buffered per-cell blocks
    # (3*D*bf) + a/x/o io (3*M*max(K,D)*2) + h/hn/acc scratch (M*D*8)
    block_f = 0
    for bf in (1024, 768, 512, 384, 256, 128):
        if F % bf != 0:
            continue
        vmem = (K * D + 2 * 3 * D * bf + 3 * M * max(K, D) * 2
                + M * D * 8)
        if vmem <= 13 * 1024 * 1024:
            block_f = bf
            break
    if not block_f:
        return None
    from magicdec_tpu.ops import pallas as PL
    from magicdec_tpu.ops.pallas.quant_matmul import quant_layer_tail_pallas

    y = quant_layer_tail_pallas(
        a.reshape(M, K), x.reshape(M, D), wo.q, wo.scale, w13.q, w13.scale,
        w2.q, w2.scale, norm[0], block_f=block_f, norm_eps=norm[1],
        interpret=PL.use_interpret())
    return y.reshape(*lead, D)


def dense_matmul(x: jnp.ndarray, w: jnp.ndarray, norm=None, residual=None,
                 rows_hint: int = 0) -> jnp.ndarray:
    """[residual +] rms_norm?(x) @ w for DENSE (bf16) weights.

    The decode-path counterpart of quant_matmul for unquantized target
    weights (this module is the matmul-backend dispatch home): when
    ``rows_hint`` is set (ModelConfig.decode_rows — target decode/verify
    passes only) and the pallas backend is on, routes to the weight-streaming
    ``dense_matmul_fused_pallas`` kernel with the norm/residual fused
    in-kernel — on-chip profiling measured ~2.6 ms/forward of XLA-dot +
    stranded-elementwise overhead on the dense target path (COVERAGE.md
    round-4 close-out).  Routing and blocking derive from rows_hint, never
    the live M, so verify (M = B*(gamma+1)) and baseline (M = B) rows stay
    bit-identical (the golden spec == AR contract).  rows_hint == 0 (prefill,
    mesh engines, external callers) keeps the plain XLA dot.
    """
    if (rows_hint and _DENSE_KERNELS and _MATMUL_BACKEND == "pallas"
            and w.ndim == 2 and not is_quantized(w)):
        In, Out = w.shape
        lead = x.shape[:-1]
        M = 1
        for d in lead:
            M *= d
        if (rows_hint <= 512 and M <= rows_hint and In % 128 == 0
                and Out % 128 == 0):
            from magicdec_tpu.ops import pallas as PL
            from magicdec_tpu.ops.pallas.quant_matmul import (
                dense_matmul_fused_pallas)

            # norm fusion needs one in-block spanning the contraction (the
            # row statistic); plain/residual dots may split the in axis
            block_in = In if norm is not None else min(_in_block_cap(In), In)
            if In % block_in:
                block_in = In
            block_out = _pick_block_out(Out, rows_hint, block_in, In,
                                        block_in * 2, norm is not None)
            if block_out:
                xm = x.reshape(M, In)
                y = dense_matmul_fused_pallas(
                    xm, w, norm[0] if norm is not None else None,
                    residual.reshape(M, Out) if residual is not None else None,
                    block_in=block_in, block_out=block_out,
                    norm=norm is not None,
                    norm_eps=(norm[1] if norm is not None else 1e-5),
                    interpret=PL.use_interpret())
                return y.reshape(*lead, Out)
    if norm is not None:
        x = _rms_norm(x, norm[0], norm[1])
    y = x @ w
    return y if residual is None else residual + y


def dense_mlp(x: jnp.ndarray, w13: jnp.ndarray, w2: jnp.ndarray, norm,
              residual=None, rows_hint: int = 0):
    """Whole DENSE FFN block — rms_norm -> silu-gated MLP -> w2 [+ residual]
    — as ONE pallas call (ops/pallas/quant_matmul.dense_mlp_pallas) when
    shapes allow, else ``None`` (caller falls back to dense_matmul pieces).

    quant_mlp at bits=16: target decode/verify passes only (rows_hint
    required — routing is M-invariant for the golden contract; see
    dense_matmul).  bf16 weight blocks are 2x the int8 ones, so the VMEM
    budget admits smaller F-blocks and smaller row counts than quant_mlp.
    """
    if not rows_hint or not _DENSE_KERNELS or _MATMUL_BACKEND != "pallas":
        return None
    if is_quantized(w13) or is_quantized(w2):
        return None
    if w13.ndim != 2 or w2.ndim != 2:
        return None
    lead = x.shape[:-1]
    D = x.shape[-1]
    F = w13.shape[1] // 2
    if w2.shape != (F, D):
        return None
    M = 1
    for d in lead:
        M *= d
    if not (rows_hint <= 512 and M <= rows_hint and D % 128 == 0
            and D <= 4096):
        return None
    # weight blocks (gate + up [D, bf] + w2 [bf, D], bf16, double-buffered
    # -> 12*D*bf bytes) + row-resident x/hn/acc/o/res sized at rows_hint
    block_f = 0
    for bf in (1024, 768, 512, 384, 256, 128):
        if F % bf == 0 and 12 * D * bf + rows_hint * D * 14 <= 14 * 1024 * 1024:
            block_f = bf
            break
    if not block_f:
        return None
    from magicdec_tpu.ops import pallas as PL
    from magicdec_tpu.ops.pallas.quant_matmul import dense_mlp_pallas

    y = dense_mlp_pallas(
        x.reshape(M, D), w13, w2, norm[0],
        residual.reshape(M, D) if residual is not None else None,
        block_f=block_f, norm_eps=norm[1], interpret=PL.use_interpret())
    return y.reshape(*lead, D)


def quantize_embed(embed: jnp.ndarray, bits: int = 8) -> QuantizedWeight:
    """Quantize the embedding table, stored TRANSPOSED as [D, V] with
    per-vocab-column scales — one format serves both consumers:

    - tied head: ``quant_matmul(x, embed_q)`` directly (column scale = the
      per-output-channel scheme);
    - lookup: token t's row is column t times scale[0, t]
      (models.llama.embed_lookup).

    This is a memory feature the reference lacks (it quantizes nn.Linear
    only): the bf16 table is ~0.5 GB at llama-3 vocab — part of what decides
    whether 32k-context B=32 fits one chip's HBM.  int8 by default;
    embeddings are quality-sensitive, so int4 is deliberately not offered.
    """
    return quantize_weight(embed.T, bits=bits)


@functools.lru_cache(maxsize=8)
def _jit_quantize_weight(bits, group_size):
    """Jitted quantize_weight: the eager path materializes ~3 f32 copies of
    the weight (wf/grouped/q) — at 8B-leaf sizes that transient alone OOMs a
    chip that comfortably holds the quantized result; under jit XLA fuses
    the pipeline to input + outputs."""
    return jax.jit(functools.partial(quantize_weight, bits=bits,
                                     group_size=group_size))


def quantize_params(params, bits: int = 8, group_size: int = None,
                    include_head: bool = True,
                    materialize_tied_head: bool = False,
                    include_embed: bool = False):
    """Quantize every linear layer weight (not embeddings/norms), like the
    reference's convert_for_runtime swapping all nn.Linear (quantize.py:44-49).

    ``include_head=False`` leaves lm_head as the ORIGINAL array (shared
    buffer, no copy): a draft-pass weight copy then costs only the layer
    weights' quantized bytes — the lm_head is ~20%% of a 1B model and the
    shared bf16 head adds ~0.3 ms/draft step instead of ~0.5 GB of HBM.

    ``materialize_tied_head``: for tied-embedding models (lm_head is None,
    head reads embed.T) build a QUANTIZED [D, V] head from the embedding.
    Used for DRAFT weight copies: the tied bf16 head read is ~0.7 ms of a
    ~5 ms draft step at llama-3.2-1b B=32 (scripts/profile_draft.py) while
    the target keeps its exact tied head for verification.
    """
    qw = _jit_quantize_weight(bits, group_size)
    layers = dict(params["layers"])
    for key in QUANT_KEYS:
        if layers.get(key) is not None:
            layers[key] = qw(layers[key])
    out = dict(params, layers=layers)
    embed = params.get("embed")
    embed_quantized = is_quantized(embed)
    if include_head:
        if params.get("lm_head") is not None and not is_quantized(params["lm_head"]):
            out["lm_head"] = qw(params["lm_head"])
        elif (materialize_tied_head and params.get("lm_head") is None
              and embed is not None and not embed_quantized):
            out["lm_head"] = qw(embed.T)
    if include_embed and embed is not None and not embed_quantized:
        out["embed"] = quantize_embed(embed)  # int8 always (see quantize_embed)
    return out


def bits_from_path(path: str):
    """Checkpoint-name convention (reference Engine/utils.py:201-205)."""
    if "int8" in str(path):
        return 8
    if "int4" in str(path):
        return 4
    return None
