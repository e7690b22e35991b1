"""Numerics parity: our transformer core vs real HF transformers models.

Builds tiny random Llama / Qwen2 models with the installed `transformers`,
converts their state_dicts, and compares logits — proving the core implements
the exact architecture the reference's embedder checkpoints use
(milvus/RAG.py:68-111)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from autostyle_tts_tpu.models import transformer as core  # noqa: E402
from autostyle_tts_tpu.utils.hf_convert import (  # noqa: E402
    config_from_hf, convert_state_dict,
)


def _compare(hf_model, tokens: np.ndarray, atol: float = 2e-3) -> None:
    cfg = config_from_hf(hf_model.config)
    params = convert_state_dict(hf_model.state_dict(), cfg)
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    import dataclasses

    cfg32 = dataclasses.replace(cfg, dtype="float32")
    got = np.asarray(core.forward(params, cfg32, jnp.asarray(tokens)).logits)
    # compare in probability space (logits can differ by tiny fp noise)
    err = np.abs(got - ref).max()
    assert err < atol, f"max logit err {err}"


def test_llama_parity():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    tokens = np.random.default_rng(0).integers(0, 128, (2, 10)).astype(np.int32)
    _compare(model, tokens)


def test_qwen2_parity_with_bias():
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(cfg).eval()
    # Qwen2 has attention biases — the converter must carry them
    sd = model.state_dict()
    assert any("q_proj.bias" in k for k in sd)
    tokens = np.random.default_rng(1).integers(0, 128, (1, 12)).astype(np.int32)
    _compare(model, tokens)


def test_config_from_hf_3b_geometry():
    """Llama-3.2-3B HF config maps onto our llama32_3b_config geometry."""
    hf = dict(
        vocab_size=128256, hidden_size=3072, num_hidden_layers=28,
        num_attention_heads=24, num_key_value_heads=8, intermediate_size=8192,
        max_position_embeddings=131072, rope_theta=500000.0, rms_norm_eps=1e-5,
    )
    cfg = config_from_hf(hf)
    from autostyle_tts_tpu.utils.config import llama32_3b_config

    want = llama32_3b_config()
    assert (cfg.dim, cfg.n_layers, cfg.n_heads, cfg.n_kv_heads, cfg.ffn_dim) == (
        want.dim, want.n_layers, want.n_heads, want.n_kv_heads, want.ffn_dim
    )
