"""Rotary position embeddings, TPU-native (pure jnp; fuses into surrounding jit).

Covers both rope variants the reference delegates to flashinfer
(Engine/SnapKV/model.py:133-156): standard RoPE with linear positional scaling
(`rope_scale`) and llama-3.1 NTK-style wavelength-dependent scaling.

Layout note: the reference permutes wq/wk at checkpoint-conversion time
(convert_hf_checkpoint.py:103-114) so that flashinfer's ``interleave=True``
matches HF.  We instead keep HF's native non-interleaved ("rotate-half")
layout and skip the permutation entirely — the composition is numerically
identical to HF transformers, which is the ground truth both use.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp

from magicdec_tpu.config import ModelConfig


@functools.lru_cache(maxsize=64)
def _inv_freq_cached(head_dim: int, rope_base: float, scaling_factor: float,
                     low_freq_factor, high_freq_factor, original_max_pos):
    import numpy as np

    inv_freq = rope_base ** (-np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    if low_freq_factor is not None and high_freq_factor is not None:
        # llama-3.1 rule: long wavelengths are fully scaled, short ones untouched,
        # mid-band smoothly interpolated (same rule HF + flashinfer implement).
        old_len = float(original_max_pos)
        low_wavelen = old_len / low_freq_factor
        high_wavelen = old_len / high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (old_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
        smooth = np.clip(smooth, 0.0, 1.0)
        scaled = (1 - smooth) * inv_freq / scaling_factor + smooth * inv_freq
        inv_freq = np.where(wavelen < high_wavelen, inv_freq,
                            np.where(wavelen > low_wavelen, inv_freq / scaling_factor, scaled))
    elif scaling_factor != 1.0:
        # linear positional interpolation (llama-2-7b-32k style)
        inv_freq = inv_freq / scaling_factor
    # cache numpy, not jnp: a jnp array built inside a trace would leak a tracer
    return np.asarray(inv_freq, dtype=np.float32)


def rope_inv_freq(cfg: ModelConfig) -> jnp.ndarray:
    """Per-frequency inverse wavelengths, shape [head_dim // 2], float32."""
    return jnp.asarray(_inv_freq_cached(
        cfg.head_dim, cfg.rope_base, cfg.rope_scaling_factor,
        cfg.low_freq_factor, cfg.high_freq_factor,
        cfg.original_max_position_embeddings))


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """positions [...,] int -> (cos, sin) each [..., head_dim//2] float32."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_cs(x: jnp.ndarray, cos: jnp.ndarray,
                  sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE from PRECOMPUTED (cos, sin) [..., T, head_dim//2].

    Positions are layer-invariant, so forwards compute cos/sin ONCE outside
    the layer scan (lax.scan does not hoist xs-invariant work: computing them
    per layer costs 2L transcendental dispatches per step)."""
    half = x.shape[-1] // 2
    cos = cos[..., None, :]  # broadcast over heads: [..., T, 1, half]
    sin = sin[..., None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE.

    x: [..., T, H, D] (heads after the position axis), positions: broadcastable
    to x.shape[:-2] (typically [B, T]).  Rotation is computed in fp32 and cast
    back to x.dtype, matching the fp32-rotation convention of the reference's
    kernel path.
    """
    cos, sin = rope_cos_sin(positions, inv_freq)  # [..., T, half]
    return apply_rope_cs(x, cos, sin)
