"""M0 parity gate: our functional Llama forward must match HF transformers
logits on a tiny randomly-initialised model (SURVEY.md §7 build order step 1).

Covers: rope (standard + llama3.1 + linear scaling), GQA attention, rmsnorm,
SiLU MLP, qkv bias (Qwen-style), tied embeddings, KV-cache decode path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from magicdec_tpu.models import llama as M
from magicdec_tpu.utils.checkpoint import config_from_hf, params_from_hf_model


def _make_hf_llama(seed=0, *, vocab=128, dim=64, n_layer=2, n_head=4, n_kv=2,
                   inter=112, rope_scaling=None, tie=False, attention_bias=False):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=dim, intermediate_size=inter,
        num_hidden_layers=n_layer, num_attention_heads=n_head,
        num_key_value_heads=n_kv, max_position_embeddings=4096,
        rope_theta=10000.0, rope_scaling=rope_scaling,
        tie_word_embeddings=tie, attention_bias=attention_bias,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    return model


def _alloc_caches(cfg, B, S, dtype=jnp.float32):
    shape = (cfg.n_layer, B, S, cfg.n_kv_head * cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _hf_logits(model, tokens):
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(np.asarray(tokens))).logits.numpy()


@pytest.mark.parametrize("rope_scaling", [
    None,
    {"rope_type": "linear", "factor": 4.0},
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
])
def test_prefill_logits_match_hf(rope_scaling):
    model = _make_hf_llama(rope_scaling=rope_scaling)
    cfg = config_from_hf(model.config)
    params = params_from_hf_model(model, cfg)

    rng = np.random.RandomState(0)
    B, T = 2, 17
    tokens = rng.randint(0, cfg.vocab_size, size=(B, T)).astype(np.int32)

    caches = _alloc_caches(cfg, B, 32)
    logits, _ = M.forward_target(params, cfg, jnp.asarray(tokens),
                                 jnp.zeros(B, jnp.int32), caches,
                                 return_logits=True)
    ref = _hf_logits(model, tokens)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


def test_qwen_style_bias_and_tied_embeddings():
    model = _make_hf_llama(seed=3, tie=True, attention_bias=True)
    cfg = config_from_hf(model.config)
    assert cfg.qkv_bias and cfg.tie_word_embeddings
    params = params_from_hf_model(model, cfg)
    assert params["lm_head"] is None

    rng = np.random.RandomState(1)
    tokens = rng.randint(0, cfg.vocab_size, size=(1, 9)).astype(np.int32)
    caches = _alloc_caches(cfg, 1, 16)
    logits, _ = M.forward_target(params, cfg, jnp.asarray(tokens),
                                 jnp.zeros(1, jnp.int32), caches,
                                 return_logits=True)
    ref = _hf_logits(model, tokens)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


def test_incremental_decode_matches_full_forward():
    """Chunked prefill + single-token decode == one-shot forward (cache path)."""
    model = _make_hf_llama(seed=7)
    cfg = config_from_hf(model.config)
    params = params_from_hf_model(model, cfg)

    rng = np.random.RandomState(2)
    B, T = 3, 12
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(B, T)).astype(np.int32))

    caches = _alloc_caches(cfg, B, 32)
    full_logits, _ = M.forward_target(params, cfg, tokens,
                                      jnp.zeros(B, jnp.int32), caches,
                                      return_logits=True)

    # prefill first 8 in two chunks of 4, then decode tokens 8..11 one by one
    caches = _alloc_caches(cfg, B, 32)
    lens = jnp.zeros(B, jnp.int32)
    outs = []
    for chunk in (tokens[:, 0:4], tokens[:, 4:8]):
        logits, caches = M.forward_target(params, cfg, chunk, lens, caches,
                                          return_logits=True)
        lens = lens + chunk.shape[1]
        outs.append(logits)
    for t in range(8, T):
        logits, caches = M.forward_target(params, cfg, tokens[:, t:t + 1], lens,
                                          caches, return_logits=True)
        lens = lens + 1
        outs.append(logits)
    step_logits = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full_logits),
                               atol=1e-4, rtol=1e-3)


def test_argmax_head_matches_logits_argmax():
    model = _make_hf_llama(seed=11)
    cfg = config_from_hf(model.config)
    params = params_from_hf_model(model, cfg)
    rng = np.random.RandomState(4)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(2, 6)).astype(np.int32))
    caches = _alloc_caches(cfg, 2, 16)
    toks, _ = M.forward_target(params, cfg, tokens, jnp.zeros(2, jnp.int32), caches)
    logits, _ = M.forward_target(params, cfg, tokens, jnp.zeros(2, jnp.int32),
                                 _alloc_caches(cfg, 2, 16), return_logits=True)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(jnp.argmax(logits, axis=-1)))
