"""Text frontend: normalizer + self-contained byte-level tokenizer.

Replaces the CosyVoice text frontend (text normalization + tokenizer with
language tags <|zh|><|en|><|jp|><|yue|><|ko|>, reference usage basic.py:13 and
SURVEY §2.3.1 "Text frontend" row). Host-side, deterministic, no external
vocab files: UTF-8 bytes + special/tag tokens, emitting fixed-shape int32
buffers for the device. Byte-level keeps EN/ZH/JA/KO/YUE in one vocab with
zero OOV — the language tag carries the language prior instead of the
tokenizer.
"""

from __future__ import annotations

import re
import unicodedata
from typing import List, Optional, Tuple

import numpy as np

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
TASK_TTS = 3          # task tokens let one LM host multiple conditioning modes
TASK_VC = 4
LANG_TAGS = {"zh": 5, "en": 6, "jp": 7, "yue": 8, "ko": 9}
BYTE_OFFSET = 16
VOCAB_SIZE = BYTE_OFFSET + 256  # 272; TokenLMConfig.text_vocab_size must be >=

_TAG_RE = re.compile(r"<\|(zh|en|jp|yue|ko)\|>")

_PUNCT_MAP = {
    "。": ". ", "，": ", ", "、": ", ", "！": "! ", "？": "? ", "；": "; ",
    "：": ": ", "“": '"', "”": '"', "‘": "'", "’": "'", "（": " (", "）": ") ",
    "《": '"', "》": '"', "…": "... ", "—": "-", "·": " ",
}


def normalize(text: str) -> str:
    """NFKC + CJK punctuation mapping + whitespace collapse. Keeps language
    tags intact."""
    parts = []
    last = 0
    for m in _TAG_RE.finditer(text):
        parts.append(_normalize_plain(text[last : m.start()]))
        parts.append(m.group(0))
        last = m.end()
    parts.append(_normalize_plain(text[last:]))
    return "".join(parts).strip()


def _normalize_plain(text: str) -> str:
    text = unicodedata.normalize("NFKC", text)
    for a, b in _PUNCT_MAP.items():
        text = text.replace(a, b)
    text = re.sub(r"\s+", " ", text)
    return text


def detect_language(text: str) -> str:
    """Char-class language guess for untagged input (reference passed explicit
    tags; we accept both)."""
    han = sum(1 for c in text if "一" <= c <= "鿿")
    kana = sum(1 for c in text if "぀" <= c <= "ヿ")
    hangul = sum(1 for c in text if "가" <= c <= "힯")
    if kana > 0:
        return "jp"
    if hangul > 0:
        return "ko"
    if han > 0:
        return "zh"
    return "en"


def encode(
    text: str,
    language: Optional[str] = None,
    add_bos: bool = True,
    add_eos: bool = True,
) -> np.ndarray:
    """text -> int32 ids: [BOS] [lang tag] bytes... [EOS]. Inline <|xx|> tags
    become tag tokens at their position."""
    text = normalize(text)
    ids: List[int] = []
    if add_bos:
        ids.append(BOS_ID)
    # leading language tag
    m = _TAG_RE.match(text)
    if not m:
        lang = language or detect_language(text)
        ids.append(LANG_TAGS[lang])
    last = 0
    for m in _TAG_RE.finditer(text):
        ids.extend(BYTE_OFFSET + b for b in text[last : m.start()].encode("utf-8"))
        ids.append(LANG_TAGS[m.group(1)])
        last = m.end()
    ids.extend(BYTE_OFFSET + b for b in text[last:].encode("utf-8"))
    if add_eos:
        ids.append(EOS_ID)
    return np.asarray(ids, np.int32)


def decode(ids) -> str:
    """Best-effort inverse (drops specials/tags)."""
    bs = bytes(int(i) - BYTE_OFFSET for i in ids if int(i) >= BYTE_OFFSET)
    return bs.decode("utf-8", errors="replace")


def encode_batch(
    texts: List[str], languages: Optional[List[Optional[str]]] = None,
    width: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> ([B, W] right-padded int32, [B] lengths)."""
    languages = languages or [None] * len(texts)
    seqs = [encode(t, l) for t, l in zip(texts, languages)]
    lens = np.asarray([len(s) for s in seqs], np.int32)
    W = width or int(lens.max())
    out = np.full((len(seqs), W), PAD_ID, np.int32)
    for i, s in enumerate(seqs):
        if len(s) > W:  # keep the sequence terminal: EOS survives truncation
            s = np.concatenate([s[: W - 1], [EOS_ID]]).astype(np.int32)
        out[i, : len(s)] = s
    return out, np.minimum(lens, W)
