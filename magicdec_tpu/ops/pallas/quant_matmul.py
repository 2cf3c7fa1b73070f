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
