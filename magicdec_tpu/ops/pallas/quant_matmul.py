"""Fused dequantize + matmul Pallas TPU kernel for weight-only INT8/INT4.

The point of weight-only quantization at decode time is HBM bandwidth: the
weight stream is 2x (int8) / 4x (int4) smaller than bf16.  The jnp fallback
(quantization.quant_matmul) lets XLA fuse the cast, but materialisation
behaviour is compiler-dependent; this kernel guarantees the weights cross HBM
quantized and are dequantized in VMEM right before the MXU.

Blocking: grid (out_blocks, in_blocks), in-blocks innermost (sequential) with
an fp32 accumulator in VMEM.  Scales are applied per in-block, which supports
group-wise int4 exactly when block_in is a multiple of group_size (the block
picks up its group's scale row).

INT4 packing (quantization.pack_int4: even in-rows -> low nibble) is consumed
without unpacking to full rows: x @ W = x_even @ lo + x_odd @ hi, so the
kernel takes the two strided halves of x (tiny, precomputed outside) and does
two half-size dots against the nibble planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int8_kernel(x_ref, q_ref, s_ref, o_ref, acc_scr, *, n_groups_per_block: int,
                 group_size: int):
    j = pl.program_id(1)
    nblocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[0]                      # [M, block_in] bf16
    w = q_ref[:]                      # [block_in, block_out] int8
    if n_groups_per_block == 1:
        wf = w.astype(x.dtype)
        part = jax.lax.dot_general(x, wf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc_scr[:] += part * s_ref[0].astype(jnp.float32)
    else:
        for g in range(n_groups_per_block):
            xg = x[:, g * group_size:(g + 1) * group_size]
            wg = w[g * group_size:(g + 1) * group_size].astype(x.dtype)
            part = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            acc_scr[:] += part * s_ref[g].astype(jnp.float32)

    @pl.when(j == nblocks - 1)
    def _finish():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def _fused_kernel(*refs, n_groups_per_block: int, group_size: int, bits: int,
                  norm: bool, norm_eps: float, gate: bool,
                  residual: bool = False):
    """One draft-layer dot with its surrounding elementwise chain fused.

    The Pallas quant dots are opaque custom calls, so XLA cannot fuse the
    norms / SiLU-gate around them — at decode shapes (M <= 256 rows) those
    leftover [M, D] elementwise kernels are pure fixed cost, ~0.7 ms of a
    3.8 ms draft step at llama-3.2-1b B=32 (COVERAGE.md).  This kernel
    subsumes them:

    - ``norm``: rms-norm the x rows in-kernel (fp32 mean-square, matching
      models.llama.rms_norm bit-for-bit) — valid when ONE in-block spans the
      whole contraction (the row statistic needs the full row).  int8 x only:
      the int4 path consumes pre-strided even/odd row halves, which cannot be
      re-sliced lane-strided in-kernel (Mosaic).
    - ``gate``: the fused gate|up projection (w13) loads TWO weight blocks
      per grid cell — gate block o and up block o + F/block_out of the SAME
      [In, 2F] array — and emits silu(gate) * up [M, F].  No weight
      relayout, second accumulator in VMEM.
    - ``residual``: adds a [M, Out] residual operand to the output in the
      finish epilogue (the layer's `x + attn_out @ wo` add, otherwise a
      stranded [M, D] elementwise dispatch between opaque custom calls).

    refs order: x (int8: [1,M,bi]; int4: xe, xo [1,M,bi//2]), q, s,
    [q2, s2 when gate], [norm_w when norm], [res when residual], o_ref,
    acc, [acc2 when gate].
    """
    assert not (gate and residual)
    i = 0
    if bits == 8:
        x_parts = (refs[i],); i += 1
    else:
        x_parts = (refs[i], refs[i + 1]); i += 2
    q_ref, s_ref = refs[i], refs[i + 1]; i += 2
    q2_ref = s2_ref = None
    if gate:
        q2_ref, s2_ref = refs[i], refs[i + 1]; i += 2
    nw_ref = None
    if norm:
        nw_ref = refs[i]; i += 1
    res_ref = None
    if residual:
        res_ref = refs[i]; i += 1
    o_ref = refs[i]; i += 1
    acc_scr = refs[i]; i += 1
    if gate:
        acc2_scr = refs[i]; i += 1
    else:
        acc2_scr = None
    xn_scr = refs[i] if norm else None

    j = pl.program_id(1)
    nblocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if gate:
            acc2_scr[:] = jnp.zeros_like(acc2_scr)

    if bits == 8:
        if norm:
            # normalize ONCE into VMEM scratch at the first grid cell and
            # reuse across all out-blocks: grid cells run sequentially, and
            # recomputing the [M, In] norm per out-block costs more than the
            # fusion saves (w13's 16-cell grid spent ~0.5 ms/16-layer scan
            # re-norming — measured on v5e)
            @pl.when((pl.program_id(0) == 0) & (j == 0))
            def _norm():
                xf = x_parts[0][0].astype(jnp.float32)
                r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                                  + norm_eps)
                xn_scr[:] = (xf * r).astype(xn_scr.dtype) * nw_ref[0]
            x = xn_scr[:]
        else:
            x = x_parts[0][0]

        def accumulate(qr, sr, acc):
            w = qr[:]
            if n_groups_per_block == 1:
                part = jax.lax.dot_general(x, w.astype(x.dtype),
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
                acc[:] += part * sr[0].astype(jnp.float32)
            else:
                for g in range(n_groups_per_block):
                    xg = x[:, g * group_size:(g + 1) * group_size]
                    wg = w[g * group_size:(g + 1) * group_size].astype(x.dtype)
                    part = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                               preferred_element_type=jnp.float32)
                    acc[:] += part * sr[g].astype(jnp.float32)
    else:
        xe, xo = x_parts[0][0], x_parts[1][0]
        half = group_size // 2

        def accumulate(qr, sr, acc):
            r = qr[:].astype(jnp.int32)
            lo = jnp.right_shift(jnp.left_shift(r, 28), 28).astype(xe.dtype)
            hi = jnp.right_shift(r, 4).astype(xe.dtype)
            for g in range(n_groups_per_block):
                sl = slice(g * half, (g + 1) * half)
                part = jax.lax.dot_general(xe[:, sl], lo[sl],
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
                part += jax.lax.dot_general(xo[:, sl], hi[sl],
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                acc[:] += part * sr[g].astype(jnp.float32)

    accumulate(q_ref, s_ref, acc_scr)
    if gate:
        accumulate(q2_ref, s2_ref, acc2_scr)

    @pl.when(j == nblocks - 1)
    def _finish():
        if gate:
            # round to the output dtype first (matching the jnp path's bf16
            # dot outputs), then gate in f32: Mosaic on v5e cannot lower
            # logistic on bf16 vectors ('vector.broadcast' element-type
            # verification failure — measured)
            g = acc_scr[:].astype(o_ref.dtype).astype(jnp.float32)
            u = acc2_scr[:].astype(o_ref.dtype).astype(jnp.float32)
            o_ref[0] = (g * jax.nn.sigmoid(g) * u).astype(o_ref.dtype)
        elif residual:
            o_ref[0] = acc_scr[:].astype(o_ref.dtype) + res_ref[0]
        else:
            o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def _int4_kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_scr, *,
                 n_groups_per_block: int, group_size: int):
    j = pl.program_id(1)
    nblocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    xe = xe_ref[0]                    # [M, block_in//2]
    xo = xo_ref[0]
    # nibble sign-extension via i32 shifts: Mosaic on v5e legalizes neither
    # shifts nor cmpi/select on i8 vectors (CLAUDE.md legalization map)
    r = q_ref[:].astype(jnp.int32)    # [block_in//2, block_out] packed
    lo = jnp.right_shift(jnp.left_shift(r, 28), 28).astype(xe.dtype)
    hi = jnp.right_shift(r, 4).astype(xe.dtype)
    half = group_size // 2
    for g in range(n_groups_per_block):
        sl = slice(g * half, (g + 1) * half)
        part = jax.lax.dot_general(xe[:, sl], lo[sl], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        part += jax.lax.dot_general(xo[:, sl], hi[sl], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        acc_scr[:] += part * s_ref[g].astype(jnp.float32)

    @pl.when(j == nblocks - 1)
    def _finish():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "block_in",
                                             "block_out", "interpret"))
def quant_matmul_pallas(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                        *, bits: int, group_size: int, block_in: int = 512,
                        block_out: int = 512, interpret: bool = False) -> jnp.ndarray:
    """x [M, In] @ dequant(q, scale) -> [M, Out] in x.dtype.

    q: int8 [In, Out] (bits=8) or packed int8 [In//2, Out] (bits=4);
    scale: f32 [G, Out] with G = In // group_size (G == 1 means per-column).
    Requires In % block_in == 0, Out % block_out == 0 and block_in a multiple
    of group_size (or group covering the whole column).
    """
    M, In = x.shape
    Out = q.shape[-1]
    G = scale.shape[0]
    gsz = group_size if G > 1 else In
    block_in = min(block_in, In)
    if G == 1:
        # int8 per-column scales are constant along the contraction: any
        # in-block that divides In is valid (the kernel re-applies the same
        # column scale to each partial sum).  Huge single blocks blow scoped
        # VMEM — In=14336 as one block compiles to 36 MiB (llama-3.1-8b w2).
        # int4's nibble plane slicing assumes group == block, so it keeps
        # one block (int4 is group-wise in practice).
        if bits != 8 or In % block_in != 0:
            block_in = In
    else:
        # the scale operand blocks as (block_in // gsz, block_out); Mosaic
        # requires its sublane block dim divisible by 8 OR equal to G, so a
        # block must cover a multiple of 8 groups — or all of them
        tile = 8 * gsz
        block_in = (max(tile, block_in // tile * tile)
                    if In % tile == 0 else In)
    block_out = min(block_out, Out)
    assert In % block_in == 0 and Out % block_out == 0, (In, Out, block_in, block_out)
    assert block_in % gsz == 0 or G == 1
    ngb = max(block_in // gsz, 1) if G > 1 else 1
    n_in, n_out = In // block_in, Out // block_out
    sblk = block_in // gsz if G > 1 else 1

    acc = pltpu.VMEM((M, block_out), jnp.float32)
    if bits == 8:
        kernel = functools.partial(_int8_kernel, n_groups_per_block=ngb,
                                   group_size=gsz)
        out = pl.pallas_call(
            kernel,
            grid=(n_out, n_in),
            in_specs=[
                pl.BlockSpec((1, M, block_in), lambda o, j: (0, 0, j)),
                pl.BlockSpec((block_in, block_out), lambda o, j: (j, o)),
                pl.BlockSpec((sblk, block_out), lambda o, j: (j if G > 1 else 0, o)),
            ],
            out_specs=pl.BlockSpec((1, M, block_out), lambda o, j: (0, 0, o)),
            out_shape=jax.ShapeDtypeStruct((1, M, Out), x.dtype),
            scratch_shapes=[acc],
            interpret=interpret,
        )(x[None], q, scale.astype(jnp.float32))
        return out[0]

    # int4
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    out = pl.pallas_call(
        functools.partial(_int4_kernel, n_groups_per_block=ngb, group_size=gsz),
        grid=(n_out, n_in),
        in_specs=[
            pl.BlockSpec((1, M, block_in // 2), lambda o, j: (0, 0, j)),
            pl.BlockSpec((1, M, block_in // 2), lambda o, j: (0, 0, j)),
            pl.BlockSpec((block_in // 2, block_out), lambda o, j: (j, o)),
            pl.BlockSpec((sblk, block_out), lambda o, j: (j if G > 1 else 0, o)),
        ],
        out_specs=pl.BlockSpec((1, M, block_out), lambda o, j: (0, 0, o)),
        out_shape=jax.ShapeDtypeStruct((1, M, Out), x.dtype),
        scratch_shapes=[acc],
        interpret=interpret,
    )(xe[None], xo[None], q, scale.astype(jnp.float32))
    return out[0]


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "block_in",
                                             "block_out", "norm", "norm_eps",
                                             "gate", "interpret"))
def quant_matmul_fused_pallas(x: jnp.ndarray, q: jnp.ndarray,
                              scale: jnp.ndarray, norm_w=None, res=None, *,
                              bits: int,
                              group_size: int, block_in: int = 512,
                              block_out: int = 512, norm: bool = False,
                              norm_eps: float = 1e-5, gate: bool = False,
                              interpret: bool = False) -> jnp.ndarray:
    """quant_matmul_pallas with the layer's elementwise chain fused in-kernel
    (see _fused_kernel): ``norm`` rms-norms x rows first (int8 only, and the
    in-block must span the whole contraction); ``gate`` treats q as the fused
    gate|up projection [In, 2F] and returns silu(x@w_gate) * (x@w_up) [M, F];
    ``res`` [M, Out] is added to the output in the finish epilogue.
    """
    M, In = x.shape
    Out = q.shape[-1]
    G = scale.shape[0]
    gsz = group_size if G > 1 else In
    block_in = min(block_in, In)
    if G == 1:
        if bits != 8 or In % block_in != 0:
            block_in = In
    else:
        tile = 8 * gsz
        block_in = (max(tile, block_in // tile * tile)
                    if In % tile == 0 else In)
    n_in = In // block_in
    assert In % block_in == 0
    assert not norm or (bits == 8 and n_in == 1), \
        "norm fusion needs int8 x and one in-block spanning the contraction"
    F = Out // 2 if gate else Out
    block_out = min(block_out, F)
    assert F % block_out == 0, (F, block_out)
    ngb = max(block_in // gsz, 1) if G > 1 else 1
    n_out = F // block_out
    sblk = block_in // gsz if G > 1 else 1

    kernel = functools.partial(_fused_kernel, n_groups_per_block=ngb,
                               group_size=gsz, bits=bits, norm=norm,
                               norm_eps=norm_eps, gate=gate,
                               residual=res is not None)
    sspec = lambda off: pl.BlockSpec(
        (sblk, block_out),
        (lambda o, j: (j if G > 1 else 0, o + off)) if off
        else (lambda o, j: (j if G > 1 else 0, o)))
    if bits == 8:
        in_specs = [pl.BlockSpec((1, M, block_in), lambda o, j: (0, 0, j))]
        args = [x[None]]
    else:
        in_specs = [pl.BlockSpec((1, M, block_in // 2), lambda o, j: (0, 0, j)),
                    pl.BlockSpec((1, M, block_in // 2), lambda o, j: (0, 0, j))]
        args = [x[:, 0::2][None], x[:, 1::2][None]]
    wrows = block_in // (2 if bits == 4 else 1)
    in_specs += [pl.BlockSpec((wrows, block_out), lambda o, j: (j, o)),
                 sspec(0)]
    args += [q, scale.astype(jnp.float32)]
    if gate:
        off = n_out
        in_specs += [pl.BlockSpec((wrows, block_out),
                                  lambda o, j: (j, o + off)),
                     sspec(off)]
        args += [q, scale.astype(jnp.float32)]
    if norm:
        in_specs += [pl.BlockSpec((1, block_in), lambda o, j: (0, j))]
        args += [norm_w.astype(x.dtype)[None]]
    if res is not None:
        in_specs += [pl.BlockSpec((1, M, block_out), lambda o, j: (0, 0, o))]
        args += [res[None]]

    scratch = [pltpu.VMEM((M, block_out), jnp.float32)]
    if gate:
        scratch += [pltpu.VMEM((M, block_out), jnp.float32)]
    if norm:
        scratch += [pltpu.VMEM((M, block_in), x.dtype)]
    out = pl.pallas_call(
        kernel,
        grid=(n_out, n_in),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, M, block_out), lambda o, j: (0, 0, o)),
        out_shape=jax.ShapeDtypeStruct((1, M, F), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[0]


def _mlp_kernel(x_ref, qg_ref, sg_ref, qu_ref, su_ref, q2_ref, s2_ref, nw_ref,
                *rest, norm_eps: float, residual: bool):
    """One FFN block — rms_norm -> silu(x@w_gate) * (x@w_up) @ w2 [+ res] —
    as a single sequential grid over F-blocks.

    Valid for int8 per-output-channel weights with the whole D contraction in
    one block (the norm's row statistic, and w2's per-column scales commute
    with the contraction so each F-block's partial product can be scaled and
    accumulated independently).  The normalized rows are computed ONCE into
    VMEM scratch at f == 0 (grid cells run sequentially; re-norming per
    F-block costs more than the fusion saves — measured on v5e for the w13
    out-block grid).  Collapses the layer's FFN from two pallas calls + two
    stranded elementwise dispatches to ONE call: at decode shapes the dots
    are weight-bandwidth-bound and every call's fixed cost is pure overhead
    (~0.95 ms of a 3.7 ms 16-layer draft scan, scripts/profile_draft.py).

    refs: x [1,M,D], q13 gate block [D,bf], s gate [1,bf], q13 up block,
    s up, q2 block [bf,D], s2 [1,D], norm_w [1,D], [res [1,M,D]], o [1,M,D];
    scratch: hn [M,D] (x.dtype), acc [M,D] f32.
    """
    if residual:
        res_ref, o_ref, hn_scr, acc_scr = rest
    else:
        o_ref, hn_scr, acc_scr = rest

    f = pl.program_id(0)
    nf = pl.num_programs(0)

    @pl.when(f == 0)
    def _init():
        xf = x_ref[0].astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + norm_eps)
        hn_scr[:] = (xf * r).astype(hn_scr.dtype) * nw_ref[0]
        acc_scr[:] = jnp.zeros_like(acc_scr)

    hn = hn_scr[:]
    g = jax.lax.dot_general(hn, qg_ref[:].astype(hn.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = g * sg_ref[0].astype(jnp.float32)
    u = jax.lax.dot_general(hn, qu_ref[:].astype(hn.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u * su_ref[0].astype(jnp.float32)
    # round to the model dtype first (matching the two-call path's bf16 dot
    # outputs), then gate in f32: Mosaic on v5e cannot lower logistic on
    # bf16 vectors (CLAUDE.md legalization map)
    gb = g.astype(o_ref.dtype).astype(jnp.float32)
    ub = u.astype(o_ref.dtype).astype(jnp.float32)
    gated = (gb * jax.nn.sigmoid(gb) * ub).astype(o_ref.dtype)
    part = jax.lax.dot_general(gated, q2_ref[:].astype(gated.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc_scr[:] += part * s2_ref[0].astype(jnp.float32)

    @pl.when(f == nf - 1)
    def _fin():
        y = acc_scr[:].astype(o_ref.dtype)
        if residual:
            y = y + res_ref[0]
        o_ref[0] = y


def _dense_fused_kernel(x_ref, w_ref, *rest, norm: bool, norm_eps: float,
                        residual: bool):
    """bf16 weight-streaming dot with the fused norm/residual epilogue ladder.

    The DENSE (bf16-verify-weight) target path today runs XLA dots with
    stranded norm/residual dispatches between them; on-chip profiling
    (COVERAGE.md round-4 close-out) measured its 1-token no-KV forward at
    6.33 ms vs a ~3.0 ms weight-stream floor + 0.70 ms head.  This kernel is
    the quant fusion ladder at bits=16: weights stream as bf16 blocks, f32
    accumulator, optional rms-norm prologue (VMEM scratch, computed once)
    and residual epilogue.  Blocking depends only on (In, Out) — M-invariant
    so verify (M=B*(gamma+1)) and baseline (M=B) rows stay bit-identical,
    the golden-contract requirement for ANY kernel on the target path.

    refs: x [1,M,bi], w [bi,bo], [norm_w [1,bi]], [res [1,M,bo]], o, acc,
    [xn scratch when norm].
    """
    idx = 0
    nw_ref = None
    if norm:
        nw_ref = rest[idx]; idx += 1
    res_ref = None
    if residual:
        res_ref = rest[idx]; idx += 1
    o_ref = rest[idx]; idx += 1
    acc_scr = rest[idx]; idx += 1
    xn_scr = rest[idx] if norm else None

    j = pl.program_id(1)
    nblocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if norm:
        @pl.when((pl.program_id(0) == 0) & (j == 0))
        def _norm():
            xf = x_ref[0].astype(jnp.float32)
            r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                              + norm_eps)
            xn_scr[:] = (xf * r).astype(xn_scr.dtype) * nw_ref[0]
        x = xn_scr[:]
    else:
        x = x_ref[0]
    acc_scr[:] += jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(j == nblocks - 1)
    def _fin():
        y = acc_scr[:].astype(o_ref.dtype)
        if residual:
            y = y + res_ref[0]
        o_ref[0] = y


@functools.partial(jax.jit, static_argnames=("block_in", "block_out", "norm",
                                             "norm_eps", "interpret"))
def dense_matmul_fused_pallas(x: jnp.ndarray, w: jnp.ndarray, norm_w=None,
                              res=None, *, block_in: int = 2048,
                              block_out: int = 512, norm: bool = False,
                              norm_eps: float = 1e-5,
                              interpret: bool = False) -> jnp.ndarray:
    """[res +] rms_norm?(x) @ w for DENSE weights (see _dense_fused_kernel).

    norm requires one in-block spanning the contraction (the row statistic).
    """
    M, In = x.shape
    Out = w.shape[-1]
    block_in = min(block_in, In)
    if In % block_in != 0 or norm:
        block_in = In
    block_out = min(block_out, Out)
    assert Out % block_out == 0, (Out, block_out)
    n_in, n_out = In // block_in, Out // block_out

    in_specs = [pl.BlockSpec((1, M, block_in), lambda o, j: (0, 0, j)),
                pl.BlockSpec((block_in, block_out), lambda o, j: (j, o))]
    args = [x[None], w]
    if norm:
        in_specs.append(pl.BlockSpec((1, block_in), lambda o, j: (0, j)))
        args.append(norm_w.astype(x.dtype)[None])
    if res is not None:
        in_specs.append(pl.BlockSpec((1, M, block_out),
                                     lambda o, j: (0, 0, o)))
        args.append(res[None])
    scratch = [pltpu.VMEM((M, block_out), jnp.float32)]
    if norm:
        scratch.append(pltpu.VMEM((M, block_in), x.dtype))
    out = pl.pallas_call(
        functools.partial(_dense_fused_kernel, norm=norm, norm_eps=norm_eps,
                          residual=res is not None),
        grid=(n_out, n_in),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, M, block_out), lambda o, j: (0, 0, o)),
        out_shape=jax.ShapeDtypeStruct((1, M, Out), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[0]


def _dense_mlp_kernel(x_ref, wg_ref, wu_ref, w2_ref, nw_ref, *rest,
                      norm_eps: float, residual: bool):
    """_mlp_kernel at bits=16: the whole DENSE FFN block — rms_norm ->
    silu(x@w_gate) * (x@w_up) @ w2 [+ res] — as one sequential F-block grid.

    The dense (bf16-verify-weight) target path otherwise runs XLA dots with
    the norm / SiLU / residual stranded between them — measured ~2.6 ms of
    dense-path overhead per 1-token target forward (COVERAGE.md round-4
    close-out).  Weight blocks stream as bf16; per-F-block partial products
    accumulate in f32 (contraction-commutative, so per-row numerics are
    M-invariant — the verify M=B*(gamma+1) vs baseline M=B golden contract).

    refs: x [1,M,D], w_gate blk [D,bf], w_up blk [D,bf], w2 blk [bf,D],
    norm_w [1,D], [res [1,M,D]], o [1,M,D]; scratch: hn [M,D], acc [M,D] f32.
    """
    if residual:
        res_ref, o_ref, hn_scr, acc_scr = rest
    else:
        o_ref, hn_scr, acc_scr = rest

    f = pl.program_id(0)
    nf = pl.num_programs(0)

    @pl.when(f == 0)
    def _init():
        xf = x_ref[0].astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + norm_eps)
        hn_scr[:] = (xf * r).astype(hn_scr.dtype) * nw_ref[0]
        acc_scr[:] = jnp.zeros_like(acc_scr)

    hn = hn_scr[:]
    g = jax.lax.dot_general(hn, wg_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = jax.lax.dot_general(hn, wu_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # round to the model dtype first (matching the XLA path's bf16 dot
    # outputs), then gate in f32: Mosaic on v5e cannot lower logistic on
    # bf16 vectors (CLAUDE.md legalization map)
    gb = g.astype(o_ref.dtype).astype(jnp.float32)
    ub = u.astype(o_ref.dtype).astype(jnp.float32)
    gated = (gb * jax.nn.sigmoid(gb) * ub).astype(o_ref.dtype)
    acc_scr[:] += jax.lax.dot_general(gated, w2_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(f == nf - 1)
    def _fin():
        y = acc_scr[:].astype(o_ref.dtype)
        if residual:
            y = y + res_ref[0]
        o_ref[0] = y


@functools.partial(jax.jit, static_argnames=("block_f", "norm_eps",
                                             "interpret"))
def dense_mlp_pallas(x: jnp.ndarray, w13: jnp.ndarray, w2: jnp.ndarray,
                     norm_w: jnp.ndarray, res=None, *, block_f: int,
                     norm_eps: float, interpret: bool = False) -> jnp.ndarray:
    """res + rms_norm(x) |> silu-gated DENSE MLP, one pallas call
    (see _dense_mlp_kernel).

    x [M, D]; w13 bf16 [D, 2F] (gate cols [:F], up cols [F:]); w2 [F, D];
    norm_w [D]; res optional [M, D].  Requires F % block_f == 0.
    """
    M, D = x.shape
    F = w13.shape[-1] // 2
    n_f = F // block_f
    assert F % block_f == 0, (F, block_f)
    in_specs = [
        pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)),            # x
        pl.BlockSpec((D, block_f), lambda f: (0, f)),            # w_gate blk
        pl.BlockSpec((D, block_f), lambda f, n_f=n_f: (0, f + n_f)),  # w_up
        pl.BlockSpec((block_f, D), lambda f: (f, 0)),            # w2 blk
        pl.BlockSpec((1, D), lambda f: (0, 0)),                  # norm_w
    ]
    args = [x[None], w13, w13, w2, norm_w.astype(x.dtype)[None]]
    if res is not None:
        in_specs.append(pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)))
        args.append(res[None])
    out = pl.pallas_call(
        functools.partial(_dense_mlp_kernel, norm_eps=norm_eps,
                          residual=res is not None),
        grid=(n_f,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, M, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, D), x.dtype),
                        pltpu.VMEM((M, D), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[0]


def _layer_tail_kernel(a_ref, qo_ref, so_ref, x_ref, qg_ref, sg_ref, qu_ref,
                       su_ref, q2_ref, s2_ref, nw_ref, o_ref, h_scr, hn_scr,
                       acc_scr, *, norm_eps: float):
    """The WHOLE post-attention layer tail in one pallas call:

        h   = x + attn_out @ wo            (residual 1)
        out = h + silu-gated-MLP(rms_norm(h))   (residual 2)

    Draft-pass only (engine parity note in quantization.quant_layer_tail).
    wo rides as a single constant-index block (DMA'd once, resident across
    the sequential F-block grid); h/hn are computed into VMEM scratch at
    f == 0; each grid cell accumulates one F-block of the MLP exactly like
    _mlp_kernel.  Collapses the tail from two calls (wo, mlp) to one —
    at decode shapes each pallas call's fixed cost rivals its weight-stream
    time (scripts/profile_draft.py).
    """
    f = pl.program_id(0)
    nf = pl.num_programs(0)

    @pl.when(f == 0)
    def _init():
        part = jax.lax.dot_general(a_ref[0], qo_ref[:].astype(a_ref.dtype),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        part = part * so_ref[0].astype(jnp.float32)
        h = x_ref[0] + part.astype(h_scr.dtype)
        h_scr[:] = h
        hf = h.astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(hf * hf, axis=-1, keepdims=True) + norm_eps)
        hn_scr[:] = (hf * r).astype(hn_scr.dtype) * nw_ref[0]
        acc_scr[:] = jnp.zeros_like(acc_scr)

    hn = hn_scr[:]
    g = jax.lax.dot_general(hn, qg_ref[:].astype(hn.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = g * sg_ref[0].astype(jnp.float32)
    u = jax.lax.dot_general(hn, qu_ref[:].astype(hn.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u * su_ref[0].astype(jnp.float32)
    gb = g.astype(o_ref.dtype).astype(jnp.float32)
    ub = u.astype(o_ref.dtype).astype(jnp.float32)
    gated = (gb * jax.nn.sigmoid(gb) * ub).astype(o_ref.dtype)
    part = jax.lax.dot_general(gated, q2_ref[:].astype(gated.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc_scr[:] += part * s2_ref[0].astype(jnp.float32)

    @pl.when(f == nf - 1)
    def _fin():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype) + h_scr[:]


@functools.partial(jax.jit, static_argnames=("block_f", "norm_eps",
                                             "interpret"))
def quant_layer_tail_pallas(a: jnp.ndarray, x: jnp.ndarray, qo: jnp.ndarray,
                            so: jnp.ndarray, q13: jnp.ndarray,
                            s13: jnp.ndarray, q2: jnp.ndarray,
                            s2: jnp.ndarray, norm_w: jnp.ndarray, *,
                            block_f: int, norm_eps: float,
                            interpret: bool = False) -> jnp.ndarray:
    """One call for the layer tail (see _layer_tail_kernel).

    a [M, K] attention output; x [M, D] residual input; qo int8 [K, D] with
    per-column scales so [1, D]; q13 int8 [D, 2F] / s13 [1, 2F];
    q2 int8 [F, D] / s2 [1, D]; norm_w [D].  Requires F % block_f == 0.
    """
    M, K = a.shape
    D = x.shape[-1]
    F = q13.shape[-1] // 2
    n_f = F // block_f
    assert F % block_f == 0, (F, block_f)
    in_specs = [
        pl.BlockSpec((1, M, K), lambda f: (0, 0, 0)),            # a
        pl.BlockSpec((K, D), lambda f: (0, 0)),                  # wo (whole)
        pl.BlockSpec((1, D), lambda f: (0, 0)),                  # so
        pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)),            # x
        pl.BlockSpec((D, block_f), lambda f: (0, f)),            # w_gate blk
        pl.BlockSpec((1, block_f), lambda f: (0, f)),            # s_gate
        pl.BlockSpec((D, block_f), lambda f, n_f=n_f: (0, f + n_f)),  # w_up
        pl.BlockSpec((1, block_f), lambda f, n_f=n_f: (0, f + n_f)),  # s_up
        pl.BlockSpec((block_f, D), lambda f: (f, 0)),            # w2 blk
        pl.BlockSpec((1, D), lambda f: (0, 0)),                  # s2
        pl.BlockSpec((1, D), lambda f: (0, 0)),                  # norm_w
    ]
    s13f = s13.astype(jnp.float32)
    args = [a[None], qo, so.astype(jnp.float32), x[None],
            q13, s13f, q13, s13f, q2, s2.astype(jnp.float32),
            norm_w.astype(x.dtype)[None]]
    out = pl.pallas_call(
        functools.partial(_layer_tail_kernel, norm_eps=norm_eps),
        grid=(n_f,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, M, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, D), x.dtype),
                        pltpu.VMEM((M, D), x.dtype),
                        pltpu.VMEM((M, D), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[0]


@functools.partial(jax.jit, static_argnames=("block_f", "norm_eps",
                                             "interpret"))
def quant_mlp_pallas(x: jnp.ndarray, q13: jnp.ndarray, s13: jnp.ndarray,
                     q2: jnp.ndarray, s2: jnp.ndarray, norm_w: jnp.ndarray,
                     res=None, *, block_f: int, norm_eps: float,
                     interpret: bool = False) -> jnp.ndarray:
    """res + rms_norm(x) |> silu-gated-MLP, one pallas call (see _mlp_kernel).

    x [M, D]; q13 int8 [D, 2F] (gate cols [:F], up cols [F:]) with per-column
    scales s13 [1, 2F]; q2 int8 [F, D] with s2 [1, D]; norm_w [D];
    res optional [M, D].  Requires F % block_f == 0.
    """
    M, D = x.shape
    F = q13.shape[-1] // 2
    n_f = F // block_f
    assert F % block_f == 0, (F, block_f)
    in_specs = [
        pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)),            # x
        pl.BlockSpec((D, block_f), lambda f: (0, f)),            # w_gate blk
        pl.BlockSpec((1, block_f), lambda f: (0, f)),            # s_gate
        pl.BlockSpec((D, block_f), lambda f, n_f=n_f: (0, f + n_f)),  # w_up
        pl.BlockSpec((1, block_f), lambda f, n_f=n_f: (0, f + n_f)),  # s_up
        pl.BlockSpec((block_f, D), lambda f: (f, 0)),            # w2 blk
        pl.BlockSpec((1, D), lambda f: (0, 0)),                  # s2
        pl.BlockSpec((1, D), lambda f: (0, 0)),                  # norm_w
    ]
    s13f = s13.astype(jnp.float32)
    args = [x[None], q13, s13f, q13, s13f, q2, s2.astype(jnp.float32),
            norm_w.astype(x.dtype)[None]]
    if res is not None:
        in_specs.append(pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)))
        args.append(res[None])
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, norm_eps=norm_eps,
                          residual=res is not None),
        grid=(n_f,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, M, D), lambda f: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, M, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, D), x.dtype),
                        pltpu.VMEM((M, D), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[0]
