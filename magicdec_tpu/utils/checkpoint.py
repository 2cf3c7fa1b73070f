"""Checkpoint pipeline: HF Llama/Qwen weights -> layer-stacked JAX pytree.

Replaces the reference's convert_hf_checkpoint.py (name remap :79-99, wqkv
fusion :151-161, tied-embedding fallback :147-149).  Two deliberate departures:

- No rotary permutation of wq/wk (reference convert_hf_checkpoint.py:103-114):
  we use HF's native non-interleaved rotate-half rope directly
  (magicdec_tpu.ops.rope), so weights are taken verbatim.
- Output is a JAX pytree (optionally saved via numpy .npz / orbax), not a
  fused torch ``model.pth``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import numpy as np

import jax.numpy as jnp

from magicdec_tpu.config import ModelConfig

# HF parameter name templates for Llama/Qwen/Mistral/Yi-family decoders.
_LAYER_KEYS = {
    "q": "model.layers.{i}.self_attn.q_proj.weight",
    "k": "model.layers.{i}.self_attn.k_proj.weight",
    "v": "model.layers.{i}.self_attn.v_proj.weight",
    "qb": "model.layers.{i}.self_attn.q_proj.bias",
    "kb": "model.layers.{i}.self_attn.k_proj.bias",
    "vb": "model.layers.{i}.self_attn.v_proj.bias",
    "o": "model.layers.{i}.self_attn.o_proj.weight",
    "w1": "model.layers.{i}.mlp.gate_proj.weight",
    "w3": "model.layers.{i}.mlp.up_proj.weight",
    "w2": "model.layers.{i}.mlp.down_proj.weight",
    "attn_norm": "model.layers.{i}.input_layernorm.weight",
    "ffn_norm": "model.layers.{i}.post_attention_layernorm.weight",
}


def params_from_hf_state_dict(state: Mapping[str, Any], cfg: ModelConfig,
                              dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Build the params pytree from an HF-format state dict.

    ``state`` maps HF names to array-likes (torch tensors or numpy arrays).
    HF Linear stores [out, in]; our layout is [in, out], so weights transpose.
    """

    def arr(name: str, transpose: bool = False) -> np.ndarray:
        t = state[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        a = np.asarray(t, dtype=np.float32)
        return a.T if transpose else a

    L = cfg.n_layer
    cols = {name: [] for name in
            ("wq", "wk", "wv", "bq", "bk", "bv", "wo", "w1", "w2", "w3",
             "attn_norm", "ffn_norm")}
    for i in range(L):
        cols["wq"].append(arr(_LAYER_KEYS["q"].format(i=i), transpose=True))
        cols["wk"].append(arr(_LAYER_KEYS["k"].format(i=i), transpose=True))
        cols["wv"].append(arr(_LAYER_KEYS["v"].format(i=i), transpose=True))
        if cfg.qkv_bias:
            cols["bq"].append(arr(_LAYER_KEYS["qb"].format(i=i)))
            cols["bk"].append(arr(_LAYER_KEYS["kb"].format(i=i)))
            cols["bv"].append(arr(_LAYER_KEYS["vb"].format(i=i)))
        cols["wo"].append(arr(_LAYER_KEYS["o"].format(i=i), transpose=True))
        cols["w1"].append(arr(_LAYER_KEYS["w1"].format(i=i), transpose=True))
        cols["w3"].append(arr(_LAYER_KEYS["w3"].format(i=i), transpose=True))
        cols["w2"].append(arr(_LAYER_KEYS["w2"].format(i=i), transpose=True))
        cols["attn_norm"].append(arr(_LAYER_KEYS["attn_norm"].format(i=i)))
        cols["ffn_norm"].append(arr(_LAYER_KEYS["ffn_norm"].format(i=i)))

    def stack(xs):
        return jnp.asarray(np.stack(xs), dtype=dtype) if xs else None

    layers = {name: stack(vals) for name, vals in cols.items()}

    embed = jnp.asarray(arr("model.embed_tokens.weight"), dtype=dtype)
    if "lm_head.weight" in state:
        lm_head = jnp.asarray(arr("lm_head.weight", transpose=True), dtype=dtype)
    else:
        lm_head = None  # tied embeddings (reference convert_hf_checkpoint.py:147-149)
    final_norm = jnp.asarray(arr("model.norm.weight"), dtype=dtype)
    return {"embed": embed, "layers": layers, "final_norm": final_norm,
            "lm_head": lm_head}


def params_from_hf_model(hf_model, cfg: Optional[ModelConfig] = None,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """Convert an in-memory ``transformers`` causal-LM (used by parity tests)."""
    if cfg is None:
        cfg = config_from_hf(hf_model.config)
    state = dict(hf_model.state_dict())
    if getattr(hf_model.config, "tie_word_embeddings", False):
        state.pop("lm_head.weight", None)
    return params_from_hf_state_dict(state, cfg, dtype=dtype)


def config_from_hf(hf_cfg) -> ModelConfig:
    """Derive our ModelConfig from a transformers LlamaConfig/Qwen2Config."""
    rope_scaling = getattr(hf_cfg, "rope_scaling", None) or {}
    kw: Dict[str, Any] = {}
    rope_type = rope_scaling.get("rope_type", rope_scaling.get("type"))
    if rope_type == "llama3":
        kw.update(rope_scaling_factor=rope_scaling["factor"],
                  low_freq_factor=rope_scaling["low_freq_factor"],
                  high_freq_factor=rope_scaling["high_freq_factor"],
                  original_max_position_embeddings=rope_scaling[
                      "original_max_position_embeddings"])
    elif rope_type == "linear":
        kw.update(rope_scaling_factor=rope_scaling["factor"])
    return ModelConfig(
        name=getattr(hf_cfg, "name_or_path", "hf"),
        block_size=hf_cfg.max_position_embeddings,
        vocab_size=hf_cfg.vocab_size,
        n_layer=hf_cfg.num_hidden_layers,
        n_head=hf_cfg.num_attention_heads,
        n_kv_head=getattr(hf_cfg, "num_key_value_heads", hf_cfg.num_attention_heads),
        dim=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        rope_base=getattr(hf_cfg, "rope_theta", 10000.0),
        norm_eps=hf_cfg.rms_norm_eps,
        qkv_bias=bool(getattr(hf_cfg, "attention_bias", False)
                      or hf_cfg.model_type == "qwen2"),
        tie_word_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", False)),
        **kw,
    )


# ---------------------------------------------------------------------------
# On-disk conversion (safetensors dir -> npz), mirroring convert_hf_checkpoint
# ---------------------------------------------------------------------------

def load_hf_checkpoint_dir(checkpoint_dir: str) -> Dict[str, np.ndarray]:
    """Read a HF checkpoint directory (safetensors index or single file)."""
    from safetensors import safe_open

    d = Path(checkpoint_dir)
    index = d / "model.safetensors.index.json"
    files = []
    if index.exists():
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted({d / name for name in weight_map.values()})
    else:
        files = sorted(d.glob("*.safetensors"))
    state: Dict[str, np.ndarray] = {}
    for path in files:
        with safe_open(str(path), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    if not state:
        raise FileNotFoundError(f"no safetensors found under {checkpoint_dir}")
    return state


def config_from_checkpoint_dir(checkpoint_dir: str,
                               model_name: Optional[str] = None) -> ModelConfig:
    """Resolve the ModelConfig for an on-disk HF checkpoint: the fuzzy name
    registry first (reference transformer_configs, SnapKV/model.py:45-79),
    falling back to the directory's own config.json (covers checkpoints the
    registry does not know — the reference has no such fallback)."""
    name = model_name or Path(checkpoint_dir).name
    try:
        return ModelConfig.from_name(name)
    except KeyError:
        cfg_path = Path(checkpoint_dir) / "config.json"
        if not cfg_path.exists():
            raise
        import types

        with open(cfg_path) as f:
            raw = json.load(f)
        raw.setdefault("name_or_path", name)
        raw.setdefault("model_type", "llama")
        return config_from_hf(types.SimpleNamespace(**raw))


def convert_hf_checkpoint(checkpoint_dir: str, out_path: str,
                          model_name: Optional[str] = None,
                          dtype=jnp.bfloat16) -> None:
    """CLI entry: HF dir -> single .npz of our pytree (fp arrays)."""
    cfg = config_from_checkpoint_dir(checkpoint_dir, model_name)
    state = load_hf_checkpoint_dir(checkpoint_dir)
    params = params_from_hf_state_dict(state, cfg, dtype=dtype)
    flat = {}

    def flatten(prefix, tree):
        if tree is None:
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                flatten(f"{prefix}{k}.", v)
        else:
            flat[prefix[:-1]] = np.asarray(tree)

    flatten("", params)
    np.savez(out_path, **flat)


def load_converted(path: str, dtype=None) -> Dict[str, Any]:
    """Load an .npz produced by convert_hf_checkpoint (or its --quantize
    variant) back into the params pytree.  Quantized leaves are stored flat as
    ``<name>.q`` / ``<name>.scale`` / ``<name>.bits`` and are reconstructed
    into QuantizedWeight objects."""
    from magicdec_tpu.quantization import QuantizedWeight

    raw = np.load(path)
    params: Dict[str, Any] = {}
    for key in raw.files:
        arr = raw[key]
        if arr.dtype.kind == "V":  # np.savez stores bf16 as a raw void dtype
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        node = params
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf_dtype = None if arr.dtype in (np.int8,) or parts[-1] == "bits"             else dtype
        node[parts[-1]] = jnp.asarray(arr, dtype=leaf_dtype)

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if set(node) == {"q", "scale", "bits"}:
            In = node["q"].shape[-2]
            bits = int(node["bits"])
            scale = node["scale"].astype(jnp.float32)
            G = scale.shape[-2]
            full_in = In * (2 if bits == 4 else 1)
            return QuantizedWeight(q=node["q"], scale=scale, bits=bits,
                                   group_size=full_in // G)
        return {k: rebuild(v) for k, v in node.items()}

    params = rebuild(params)
    params.setdefault("lm_head", None)  # tied embeddings
    for name in ("bq", "bk", "bv"):
        params["layers"].setdefault(name, None)
    return params
