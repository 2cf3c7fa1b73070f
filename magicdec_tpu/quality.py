"""Model-quality evaluation: teacher-forced perplexity.

The reference has no accuracy gate at all — correctness is eyeballed via
--printoutput (SURVEY.md §4) and its int8 path ships without any quality
check (Engine/quantize.py has no eval CLI).  This module is the perplexity
gate used to (a) validate converted checkpoints against HF and (b) bound the
quality cost of int8/int4 weight-only quantization (SURVEY.md §7 M5).

TPU-shaped evaluation: chunked teacher-forced prefill as one jitted
``lax.scan`` with the KV cache riding the carry (same shape discipline as the
engine's prefill, engine/engine.py), fp32 log-softmax, one scalar readback
per batch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from magicdec_tpu.config import ModelConfig
from magicdec_tpu.models import llama as M


@functools.lru_cache(maxsize=8)
def _nll_fn(cfg: ModelConfig, B: int, S: int, C: int, backend: str,
            cache_dtype_name: str, kv_quant=False):
    """Jitted total-NLL over [B, S] windows, chunked by C tokens."""
    from magicdec_tpu.engine.engine import kv_quant_bits

    assert S % C == 0, (S, C)
    n = S // C
    cache_dtype = jnp.dtype(cache_dtype_name)
    bits = kv_quant_bits(kv_quant)

    def run(params, tokens):
        lanes = cfg.n_kv_head * cfg.head_dim
        k = jnp.zeros((cfg.n_layer, B, S, lanes // 2 if bits == 4 else lanes),
                      jnp.int8 if bits else cache_dtype)
        caches = {"k": k, "v": jnp.zeros_like(k)}
        if kv_quant:
            s = jnp.zeros((cfg.n_layer, B, cfg.n_kv_head, S), jnp.float32)
            caches.update(ks=s, vs=jnp.zeros_like(s))
        xs_tok = jnp.moveaxis(tokens.reshape(B, n, C), 1, 0)
        # target for position p is tokens[p+1]; the final position has none
        tgt = jnp.concatenate([tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], 1)
        xs_tgt = jnp.moveaxis(tgt.reshape(B, n, C), 1, 0)

        def body(carry, inp):
            caches, lens, total = carry
            chunk, tchunk = inp
            logits, caches = M.forward_target(params, cfg, chunk, lens, caches,
                                              head="logits", backend=backend)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(lp, tchunk[..., None], axis=-1)[..., 0]
            pos = lens[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
            total = total + jnp.where(pos < S - 1, nll, 0.0).sum()
            return (caches, lens + C, total), None

        init = (caches, jnp.zeros((B,), jnp.int32), jnp.zeros((), jnp.float32))
        (_, _, total), _ = jax.lax.scan(body, init, (xs_tok, xs_tgt))
        return total

    return jax.jit(run)


def perplexity(params, cfg: ModelConfig, data: np.ndarray, *,
               batch_size: int = 8, chunk_size: int = 512,
               backend: str = "jnp", cache_dtype=jnp.bfloat16,
               kv_quant=False) -> Tuple[float, float]:
    """Teacher-forced perplexity over ``data`` [N, S] token windows.

    Returns (ppl, nll_per_token).  Windows are evaluated independently (no
    cross-window context), matching the reference's PG-19 windowing
    (Data/data_converter.py:42-56).  Rows that don't fill a batch are dropped,
    like the reference's ``drop_last=True`` loader.  ``kv_quant``
    (False/True/'int8'/'int4', EngineConfig.kv_quant semantics) evaluates with
    the quantized KV cache, so the cache-quantization quality cost is
    measurable with the same gate as weight quantization.
    """
    data = np.asarray(data)
    N, S = data.shape
    assert S % chunk_size == 0 or S < chunk_size, \
        f"seq_len {S} must be a multiple of chunk_size {chunk_size}"
    C = min(chunk_size, S)
    fn = _nll_fn(cfg, batch_size, S, C, backend, jnp.dtype(cache_dtype).name,
                 kv_quant)
    total, count = 0.0, 0
    for i in range(0, N - batch_size + 1, batch_size):
        batch = jnp.asarray(data[i:i + batch_size], jnp.int32)
        total += float(np.asarray(fn(params, batch)))
        count += batch_size * (S - 1)
    if count == 0:
        raise ValueError(f"need at least batch_size={batch_size} rows, got {N}")
    nll = total / count
    return float(np.exp(nll)), nll
