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


def test_embedder_service_with_hf_tokenizer(tmp_path):
    """End-to-end: save a tiny HF Llama checkpoint, load via --embedder_hf_dir
    machinery, embed + label with the HF tokenizer driving the ids."""
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = transformers.LlamaForCausalLM(cfg).eval()
    d = tmp_path / "ckpt"
    model.save_pretrained(d)
    # a minimal tokenizer: reuse a byte-level GPT2-ish tokenizer is heavy;
    # instead exercise the service path with tokenizer=None conversion only
    from autostyle_tts_tpu.pipeline.rag import EmbedderService
    from autostyle_tts_tpu.utils.hf_convert import load_hf_checkpoint

    ecfg, params = load_hf_checkpoint(str(d))
    svc = EmbedderService(ecfg, params)

    class FakeTok:
        pad_token_id = 0
        eos_token_id = 2

        def encode(self, text):
            return [1] + [3 + (b % 100) for b in text.encode()][:50]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    svc_hf = EmbedderService(ecfg, params, tokenizer=FakeTok())
    e1 = svc_hf.embed(["hello world"])
    assert e1.shape == (1, 32) and np.isfinite(e1).all()
    labels = svc_hf.emotion_labels(["some text"])
    assert labels[0] in svc_hf.labels or labels[0] == "neutral"


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
