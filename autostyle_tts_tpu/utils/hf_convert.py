"""HuggingFace checkpoint -> framework param-tree converter.

The reference loaded its style embedder from HF checkpoints
(Llama-3.2-3B via AutoPeftModelForCausalLM, milvus/RAG.py:68-111;
Qwen2.5-7B, scripts/train_llm_cn.sh:23). This converter maps a HF
Llama/Qwen2-family ``state_dict`` (torch tensors or numpy arrays) onto the
layer-stacked fused param tree of models/transformer.py, so real weights
drop into the TPU engine:

- q/k/v projections fuse into ``wqkv`` (transposed: torch stores [out, in]),
  gate/up into ``w_gate_up``; per-layer tensors stack on a leading [L] dim.
- Qwen2's attention biases land in ``bqkv``.
- RoPE/RMSNorm/SwiGLU conventions already match (rotate-half, eps from the
  HF config) — verified numerically against transformers in
  tests/test_hf_convert.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .config import TransformerConfig


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def config_from_hf(hf_config: Any) -> TransformerConfig:
    """Build our TransformerConfig from a HF Llama/Qwen2 config object/dict."""
    get = (lambda k, d=None: getattr(hf_config, k, d)) if not isinstance(
        hf_config, dict
    ) else (lambda k, d=None: hf_config.get(k, d))
    return TransformerConfig(
        vocab_size=get("vocab_size"),
        dim=get("hidden_size"),
        n_layers=get("num_hidden_layers"),
        n_heads=get("num_attention_heads"),
        n_kv_heads=get("num_key_value_heads", get("num_attention_heads")),
        ffn_dim=get("intermediate_size"),
        max_seq_len=min(get("max_position_embeddings", 8192), 8192),
        rope_theta=float(get("rope_theta", 10000.0)),
        norm_eps=float(get("rms_norm_eps", 1e-5)),
        tie_embeddings=bool(get("tie_word_embeddings", False)),
    )


def convert_state_dict(sd: Dict[str, Any], cfg: TransformerConfig) -> Dict:
    """HF Llama/Qwen2 state_dict -> framework param tree (f32 numpy)."""
    L = cfg.n_layers

    def get(name: str, layer: Optional[int] = None) -> np.ndarray:
        key = name.format(i=layer) if layer is not None else name
        for cand in ("model." + key, key):
            if cand in sd:
                return _np(sd[cand])
        raise KeyError(f"missing weight {key!r}")

    def stack_T(name: str) -> np.ndarray:
        return np.stack([get(name, i).T for i in range(L)])

    def stack(name: str) -> np.ndarray:
        return np.stack([get(name, i) for i in range(L)])

    wq = stack_T("layers.{i}.self_attn.q_proj.weight")   # [L, D, H*hd]
    wk = stack_T("layers.{i}.self_attn.k_proj.weight")
    wv = stack_T("layers.{i}.self_attn.v_proj.weight")
    gate = stack_T("layers.{i}.mlp.gate_proj.weight")
    up = stack_T("layers.{i}.mlp.up_proj.weight")

    layers: Dict[str, np.ndarray] = {
        "attn_norm": stack("layers.{i}.input_layernorm.weight"),
        "wqkv": np.concatenate([wq, wk, wv], axis=-1),
        "wo": stack_T("layers.{i}.self_attn.o_proj.weight"),
        "mlp_norm": stack("layers.{i}.post_attention_layernorm.weight"),
        "w_gate_up": np.concatenate([gate, up], axis=-1),
        "w_down": stack_T("layers.{i}.mlp.down_proj.weight"),
    }
    if any("self_attn.q_proj.bias" in key for key in sd):  # Qwen2 family
        bq = stack("layers.{i}.self_attn.q_proj.bias")
        bk = stack("layers.{i}.self_attn.k_proj.bias")
        bv = stack("layers.{i}.self_attn.v_proj.bias")
        layers["bqkv"] = np.concatenate([bq, bk, bv], axis=-1)

    params: Dict[str, Any] = {
        "tok_emb": get("embed_tokens.weight"),
        "layers": layers,
        "final_norm": get("norm.weight"),
    }
    if not cfg.tie_embeddings:
        if "lm_head.weight" in sd:
            params["lm_head"] = _np(sd["lm_head.weight"]).T
        else:
            params["lm_head"] = params["tok_emb"].T.copy()
    return params


def load_hf_checkpoint(model_dir: str):
    """Load a local HF checkpoint directory (config.json + safetensors/bin)
    via transformers and convert. Returns (cfg, params)."""
    import transformers

    hf_cfg = transformers.AutoConfig.from_pretrained(model_dir)
    model = transformers.AutoModelForCausalLM.from_pretrained(model_dir)
    cfg = config_from_hf(hf_cfg)
    params = convert_state_dict(model.state_dict(), cfg)
    return cfg, params
