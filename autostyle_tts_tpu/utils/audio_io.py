"""WAV I/O without torchaudio: pure numpy PCM16/PCM24/float32 read+write.

Replaces ``cosyvoice.utils.file_utils.load_wav`` (resampling loader used by
every reference entry file, e.g. tts_with_rag.py:2) and ``torchaudio.save``
(tts_with_rag.py:196-197). Resampling itself lives in ops/resample.py as a
jittable polyphase conv; ``load_wav`` composes the two.
"""

from __future__ import annotations

import struct
import wave
from pathlib import Path
from typing import Tuple, Union

import numpy as np

PathLike = Union[str, Path]


def read_wav(path: PathLike) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono [T] in [-1, 1], sample_rate)."""
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def write_wav(path: PathLike, x: np.ndarray, sample_rate: int) -> None:
    """Write float mono [T] (or [1, T]) as PCM16 WAV."""
    x = np.asarray(x)
    if x.ndim == 2:
        x = x[0] if x.shape[0] <= 2 else x[:, 0]
    x = np.clip(x, -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def load_wav(path: PathLike, target_sr: int) -> np.ndarray:
    """Read + resample to target_sr (reference contract: load_wav(path, 16000),
    tts_with_rag.py:180-186). Returns float32 [T]."""
    x, sr = read_wav(path)
    if sr != target_sr:
        from ..ops.resample import resample_poly_np

        x = resample_poly_np(x, sr, target_sr)
    return x.astype(np.float32)
