"""autostyle_tts_tpu — TPU-native retrieval-augmented style-matching TTS.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Chengyuann/AutoStyle-TTS (reference layout documented in SURVEY.md):

- ``retrieval``  — in-HBM cosine top-k style store (replaces Milvus Lite,
  reference milvus/insert_embeddings.py, milvus/search_json.py).
- ``models``     — shared transformer core, embedder LLM, speech-token LM,
  flow-matching mel decoder, HiFi-GAN-class vocoder, speaker encoder,
  speech tokenizer (replaces CosyVoice-300M + HF transformers stacks).
- ``ops``        — GEMM-native mel/STFT, polyphase resampler, fused top-k,
  attention, sampling, int8 quant.
- ``parallel``   — device mesh + sharding rules (pjit/GSPMD).
- ``pipeline``   — zero_shot / vc / tts_with_style_timbre / rag engines
  (replaces the reference's CosyVoice inference_* API surface).
- ``train``      — LoRA SFT for the ERC embedder (replaces src/ft_llm.py).
- ``cli``        — drop-in CLI entry points with the reference's JSON/JSONL
  contracts (tts_with_rag, tts_for_dialog, vc_from_dir, search_json, ...).
"""

__version__ = "0.1.0"
