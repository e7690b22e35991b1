"""Single dataclass config tree with JSON + CLI overrides.

Replaces the reference's per-script argparse blocks with absolute cluster-path
defaults (reference: milvus/RAG.py:626-649, milvus/search_json.py:470,
scripts/train_llm.sh:16-28). One tree, no absolute-path defaults, every field
overridable as ``--section.field value``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


# ----------------------------------------------------------------------------- audio


@dataclass(frozen=True)
class AudioConfig:
    """DSP contract shared by every stage.

    Reference contract: 16 kHz prompt inputs (tts_with_rag.py:180-186), 24 kHz
    output per README.md:20 / BASELINE.json north star (the reference code
    actually saved 22 050 Hz — deliberate divergence recorded in SURVEY §7).
    """

    sample_rate: int = 24000          # output rate
    prompt_sample_rate: int = 16000   # style/timbre prompt input rate
    n_fft: int = 1024
    hop_length: int = 480             # 50 mel frames / s @ 24 kHz
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    # 16 kHz analysis settings for the speech tokenizer / speaker encoder
    prompt_n_fft: int = 400
    prompt_hop_length: int = 160      # 100 frames / s @ 16 kHz
    prompt_win_length: int = 400
    prompt_n_mels: int = 80
    prompt_fmax: float = 8000.0


# ----------------------------------------------------------------------------- models


@dataclass(frozen=True)
class TransformerConfig:
    """Shared decoder-core hyperparameters (used by embedder LLM + token LM)."""

    vocab_size: int = 32768
    dim: int = 1024
    n_layers: int = 14
    n_heads: int = 16
    n_kv_heads: int = 16              # < n_heads => GQA
    ffn_dim: int = 4096
    max_seq_len: int = 4096
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    dropout: float = 0.0
    tie_embeddings: bool = False
    dtype: str = "bfloat16"           # compute dtype; params kept f32 master

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


def llama32_3b_config() -> TransformerConfig:
    """Llama-3.2-3B geometry for the style embedder (reference uses this
    checkpoint via HF, milvus/RAG.py:68-111; hidden 3072 -> 6144-d concat)."""
    return TransformerConfig(
        vocab_size=128256, dim=3072, n_layers=28, n_heads=24, n_kv_heads=8,
        ffn_dim=8192, max_seq_len=8192, rope_theta=500000.0,
    )


def qwen25_7b_config() -> TransformerConfig:
    """Qwen2.5-7B geometry for the ZH embedder (scripts/train_llm_cn.sh:23)."""
    return TransformerConfig(
        vocab_size=152064, dim=3584, n_layers=28, n_heads=28, n_kv_heads=4,
        ffn_dim=18944, max_seq_len=8192, rope_theta=1000000.0,
    )


@dataclass(frozen=True)
class TokenLMConfig:
    """Speech-token LM (~300M class, CosyVoice-300M LM equivalent)."""

    text_vocab_size: int = 8192       # text tokenizer vocab
    speech_vocab_size: int = 4099     # 4096 codes + BOS/EOS/PAD
    dim: int = 1024
    n_layers: int = 14
    n_heads: int = 16
    n_kv_heads: int = 16
    ffn_dim: int = 4096
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    spk_dim: int = 192                # timbre embedding conditioning
    token_rate: int = 25              # speech tokens / second

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def speech_bos(self) -> int:
        return self.speech_vocab_size - 3

    @property
    def speech_eos(self) -> int:
        return self.speech_vocab_size - 2

    @property
    def speech_pad(self) -> int:
        return self.speech_vocab_size - 1


@dataclass(frozen=True)
class CFMConfig:
    """Conditional flow-matching mel decoder (Matcha-TTS OT-CFM equivalent;
    reference pipeline stage documented in SURVEY §2.3.1)."""

    n_mels: int = 80
    dim: int = 512
    n_layers: int = 8
    n_heads: int = 8
    ffn_dim: int = 2048
    token_vocab_size: int = 4099
    spk_dim: int = 192
    n_steps: int = 10                 # fixed-step Euler sampler (jit-friendly)
    cfg_scale: float = 0.7            # classifier-free guidance on conditioning
    # False after progressive distillation (train/cfm_distill.py folds the
    # guidance into the student field): one conditional call per Euler step.
    use_cfg: bool = True
    sigma_min: float = 1e-4
    upsample: int = 2                 # 25 Hz tokens -> 50 Hz mel frames
    # estimator-trunk compute dtype; norms/softmax/ODE state stay f32.
    # bfloat16 roughly halves the mel-decode time on v5e.
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class VocoderConfig:
    """24 kHz vocoder (HiFT-equivalent stage). Two generator families:

    kind="hifigan": ConvTranspose upsampling + MRF resblocks (the classic
    HiFi-GAN topology the reference's engine shipped).
    kind="istft": Vocos-class TPU-native head — a frame-rate ConvNeXt
    backbone predicts magnitude+phase and a GEMM-native iSTFT produces
    samples (ops/stft.istft_overlap_add); no sample-rate convolutions at
    all, ~6x less generator compute per second of audio. Both train under
    the same mel/STFT/GAN losses (train/acoustic.py)."""

    n_mels: int = 80
    kind: str = "istft"     # flagship default: the TPU-native generator
    base_channels: int = 512
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 3, 2)     # prod = 480 = hop
    upsample_kernel_sizes: Tuple[int, ...] = (10, 8, 8, 6, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    # istft-kind fields
    istft_hop: int = 480            # samples per mel frame (= audio.hop_length)
    istft_n_fft: int = 1920         # 4x hop -> 75% overlap Hann OLA
    istft_channels: int = 512
    istft_blocks: int = 8
    istft_kernel: int = 7


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    """CAM++-class timbre encoder -> 192-d x-vector (replaces campplus.onnx)."""

    n_mels: int = 80
    channels: int = 512
    emb_dim: int = 192
    n_blocks: int = 3


@dataclass(frozen=True)
class SpeechTokenizerConfig:
    """Conformer encoder + VQ: 16 kHz wav -> 25 Hz discrete tokens
    (replaces the ONNX speech tokenizer)."""

    n_mels: int = 80
    dim: int = 512
    n_layers: int = 6
    n_heads: int = 8
    ffn_dim: int = 2048
    codebook_size: int = 4096
    # 100 Hz mel frames -> 25 Hz tokens: two stride-2 conv subsamplings
    strides: Tuple[int, ...] = (2, 2)


# ----------------------------------------------------------------------------- retrieval


@dataclass(frozen=True)
class RetrievalConfig:
    """In-HBM cosine top-k store (replaces Milvus Lite; exact search —
    deliberate divergence from IVF_FLAT nlist=128, SURVEY §7)."""

    dim: int = 6144                   # 3072 emotion || 3072 biography
    capacity: int = 4096              # static HBM matrix rows (padded)
    metric: str = "cosine"
    file_prefix_path: str = ""


# ----------------------------------------------------------------------------- train


@dataclass(frozen=True)
class LoRAConfig:
    """Reference protocol: r=32, alpha=128, all-linear (src/ft_llm.py:254-261)."""

    r: int = 32
    alpha: int = 128
    dropout: float = 0.05
    target: str = "all-linear"


@dataclass(frozen=True)
class TrainConfig:
    """Reference protocol: bs 4, grad-accum 4, lr 3e-4 linear, 3 epochs,
    eval/save every 50 steps, best-by weighted-F1, NEFTune alpha=5
    (src/ft_llm.py:263-307, scripts/train_llm.sh:16-28)."""

    batch_size: int = 4
    grad_accum: int = 4
    learning_rate: float = 3e-4
    lr_schedule: str = "linear"
    warmup_steps: int = 0
    epochs: int = 3
    max_seq_len: int = 1024
    seed: int = 42
    eval_every: int = 50
    save_every: int = 50
    neftune_alpha: float = 5.0
    remat: bool = True
    # sequence packing (TRL SFTTrainer packing=True, src/ft_llm.py:302):
    # whole chat samples greedily packed into max_seq_len rows with a
    # block-diagonal attention mask + per-segment RoPE restart. Default ON
    # like the reference — ERC prompts are short, packing cuts steps ~severalx.
    packing: bool = True
    lora: LoRAConfig = field(default_factory=LoRAConfig)


# ----------------------------------------------------------------------------- mesh


@dataclass
class FrontendConfig:
    """Text frontend: tokenizer choice + text normalization.

    tokenizer: 'byte' (self-contained, zero OOV) or 'bpe' (trained vocab —
    models/bpe.py static layout: merges + direct CJK/kana plane, ~3x shorter
    ZH sequences; reference SURVEY §2.3.1 tokenizer row). With 'bpe',
    token_lm.text_vocab_size must be >= bpe.VOCAB_SIZE (29648).
    normalize_numbers: verbalize numerals/dates/abbreviations (textnorm.py)
    on the TTS path."""

    tokenizer: str = "byte"
    bpe_path: str = ""
    normalize_numbers: bool = True


@dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh. data axis shards the batch; model axis shards
    attention heads / MLP (GSPMD tensor parallel)."""

    data: int = 1
    model: int = 1


# ----------------------------------------------------------------------------- root


@dataclass
class Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    embedder: TransformerConfig = field(default_factory=llama32_3b_config)
    token_lm: TokenLMConfig = field(default_factory=TokenLMConfig)
    cfm: CFMConfig = field(default_factory=CFMConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    speaker: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)
    speech_tokenizer: SpeechTokenizerConfig = field(default_factory=SpeechTokenizerConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 42
    # int8 weight-only quantization of the token LM at engine init
    # (ops/quant.py; ~25% faster decode on v5e, half the weight HBM traffic)
    quantize_lm_int8: bool = False
    # int8 KV cache for LM decode (ops/attention.sdpa_quant): halves the
    # per-step cache read; scales fold into logits/probs so dots read int8
    quantize_lm_kv_int8: bool = False
    # lane-packed int4 weights for the DECODE MEGAKERNEL only (requires
    # quantize_lm_int8; prefill + fallback paths stay int8): halves the
    # per-step weight HBM stream — the B=1 decode bottleneck
    quantize_lm_int4: bool = False
    # >0: single-chip B=1 LM generation uses prompt-lookup SPECULATIVE
    # decoding with this draft length (token_lm.generate_speech_spec).
    # Sampling semantics are unchanged — the engine runs the sampled
    # variant (exact rejection sampling against the same top-k sampler the
    # standard path uses); only the step count changes. Worth it only with
    # trained weights whose streams accept drafts: enable when measured
    # acceptance > verify_cost/step_cost (bench.py lm_spec reports both).
    # Default off — the megakernel serves B=1.
    speculative_gamma: int = 0
    # dtype for the device->host wav fetch on the staged (B>1 / mesh /
    # profile) synthesis path. Audio lives in [-1, 1] where the f16
    # mantissa (~1e-3 step) is below 16-bit-PCM quantization, and halving
    # the payload matters through a tunneled device (the full-batch f32
    # fetch dominated batch-8 wall time). The fused B=1 program always
    # fetches f16. Set "float32" for bit-tight cross-mesh parity checks.
    fetch_dtype: str = "float16"


def demo_config() -> Config:
    """Small-but-real stack at PRODUCTION audio rates (24 kHz out / 16 kHz
    prompts): ~15M params total, sized so the full tokenizer->LM->CFM->vocoder
    pipeline trains to speech-like resynthesis on one v5e in ~1-2 h on the
    synthcorpus (train/synthcorpus.py) and the trained snapshot ships as a
    test fixture. Same code paths as the flagship config."""
    cfg = Config()
    cfg.token_lm = TokenLMConfig(
        text_vocab_size=272, speech_vocab_size=515, dim=256, n_layers=4,
        n_heads=4, n_kv_heads=4, ffn_dim=1024, max_seq_len=1024,
    )
    cfg.cfm = CFMConfig(
        dim=256, n_layers=4, n_heads=4, ffn_dim=1024,
        token_vocab_size=515, n_steps=10, dtype="float32",
    )
    cfg.vocoder = VocoderConfig(kind="hifigan", base_channels=192)
    cfg.speaker = SpeakerEncoderConfig(channels=256)
    cfg.speech_tokenizer = SpeechTokenizerConfig(
        dim=192, n_layers=3, n_heads=4, ffn_dim=768, codebook_size=512,
    )
    return cfg


def tiny_config() -> Config:
    """Small geometry for tests / CPU mesh dry-runs. Same code paths, tiny dims."""
    cfg = Config()
    cfg.embedder = TransformerConfig(
        vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=128,
    )
    cfg.token_lm = TokenLMConfig(
        # 272 = frontend.VOCAB_SIZE: byte ids run to 271; 256 would make the
        # embedding gather clamp the top 16 byte ids
        text_vocab_size=272, speech_vocab_size=67, dim=64, n_layers=2,
        n_heads=4, n_kv_heads=4, ffn_dim=128, max_seq_len=256,
    )
    cfg.cfm = CFMConfig(
        n_mels=16, dim=64, n_layers=2, n_heads=4, ffn_dim=128,
        token_vocab_size=67, spk_dim=16, n_steps=4, dtype="float32",
    )
    cfg.vocoder = VocoderConfig(
        kind="hifigan",
        n_mels=16, base_channels=32, upsample_rates=(4, 4, 2),
        upsample_kernel_sizes=(8, 8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    cfg.speaker = SpeakerEncoderConfig(n_mels=16, channels=32, emb_dim=16, n_blocks=2)
    cfg.speech_tokenizer = SpeechTokenizerConfig(
        n_mels=16, dim=32, n_layers=2, n_heads=4, ffn_dim=64, codebook_size=64,
    )
    cfg.token_lm = dataclasses.replace(cfg.token_lm, spk_dim=16)
    cfg.retrieval = RetrievalConfig(dim=32, capacity=128)
    cfg.audio = AudioConfig(
        sample_rate=2400, prompt_sample_rate=1600,
        # hop == prod(vocoder.upsample_rates) = 4*4*2 — the same frames->samples
        # invariant the flagship config holds (480 == 5*4*4*3*2)
        n_fft=128, hop_length=32, win_length=128, n_mels=16, fmax=1200.0,
        prompt_n_fft=64, prompt_hop_length=40, prompt_win_length=64,
        prompt_n_mels=16, prompt_fmax=800.0,
    )
    return cfg


# ----------------------------------------------------------------------------- (de)serialization


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def _deep_tuple(v: Any) -> Any:
    if isinstance(v, list):
        return tuple(_deep_tuple(x) for x in v)
    return v


def _from_dict(cls: Any, d: Any) -> Any:
    """Types are resolved from the default instance's runtime values (field
    annotations are strings under `from __future__ import annotations`)."""
    if not (dataclasses.is_dataclass(cls) and isinstance(d, dict)):
        return d
    obj = cls()
    updates = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        cur = getattr(obj, f.name)
        v = d[f.name]
        if dataclasses.is_dataclass(cur):
            updates[f.name] = _from_dict(type(cur), v)
        elif isinstance(cur, tuple):
            updates[f.name] = _deep_tuple(v)
        else:
            updates[f.name] = v
    return dataclasses.replace(obj, **updates)


def from_dict(d: dict) -> Config:
    return _from_dict(Config, d)


def load(path: str) -> Config:
    with open(path) as f:
        return from_dict(json.load(f))


def save(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``section.field=value`` (or ``--section.field value`` pre-split)
    dotted overrides onto the tree, coercing to the existing field's type."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, raw = ov.split("=", 1)
        parts = key.strip().lstrip("-").split(".")
        chain = [cfg]
        for p in parts[:-1]:
            chain.append(getattr(chain[-1], p))
        leaf = parts[-1]
        cur = getattr(chain[-1], leaf)
        if isinstance(cur, bool):
            val: Any = raw.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(raw)
        elif isinstance(cur, float):
            val = float(raw)
        elif isinstance(cur, tuple):
            val = tuple(type(cur[0])(x) for x in raw.split(",")) if cur else tuple(raw.split(","))
        else:
            val = raw
        # leaf configs are frozen (hashable for jit static args): rebuild the
        # chain bottom-up with dataclasses.replace; the root Config is mutable.
        for obj, name in zip(reversed(chain), reversed(parts)):
            if dataclasses.is_dataclass(obj) and not obj.__dataclass_params__.frozen:
                setattr(obj, name, val)
                break
            val = dataclasses.replace(obj, **{name: val})
    return cfg
