"""ctypes bindings for the native C++ audio data plane (native/asttts_audio.cpp).

Fast host-side path for what the reference delegated to torchaudio/libsox and
ONNX Runtime C++ (SURVEY §2.3.4): wav decode + polyphase resample + threaded
padded-batch loading straight into a pinned float32 buffer for device upload.
Filter design stays in Python (ops/resample.design_lowpass) so the native and
JAX paths share bit-identical taps/phase.

The .so is built on demand with the in-image g++ (`make -C native`); every
entry point gracefully falls back to the pure-Python implementation when the
toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libasttts_audio.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("ASTTTS_NATIVE", "1") == "0":
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.asttts_read_wav.restype = ctypes.c_int
    lib.asttts_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
    ]
    lib.asttts_resample.restype = ctypes.c_int
    lib.asttts_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    lib.asttts_load_batch.restype = ctypes.c_int
    lib.asttts_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_wav_native(path: str, max_seconds: float = 120.0) -> Tuple[np.ndarray, int]:
    """Native wav decode -> (mono float32, sr). Raises on failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    max_len = int(max_seconds * 192000)
    out = np.empty(max_len, np.float32)
    sr = ctypes.c_int(0)
    n = ctypes.c_long(0)
    rc = lib.asttts_read_wav(
        path.encode(), _fptr(out), max_len, ctypes.byref(sr), ctypes.byref(n)
    )
    if rc != 0:
        raise IOError(f"asttts_read_wav({path!r}) failed: {rc}")
    return out[: min(n.value, max_len)].copy(), sr.value


def resample_native(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Native polyphase resample, bit-matching ops.resample.resample_poly_np."""
    from ..ops.resample import design_lowpass

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    if sr_in == sr_out:
        return x.astype(np.float32)
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    taps = np.ascontiguousarray(design_lowpass(up, down), np.float64)
    x = np.ascontiguousarray(x, np.float32)
    n_out = -(-len(x) * up // down)
    out = np.empty(n_out, np.float32)
    rc = lib.asttts_resample(
        _fptr(x), len(x),
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(taps),
        up, down, _fptr(out), n_out,
    )
    if rc != 0:
        raise RuntimeError(f"asttts_resample failed: {rc}")
    return out


def load_batch_native(
    paths: List[str], target_sr: int, expect_sr: int, stride: int,
    n_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode+resample a batch into one padded [N, stride] buffer.
    Files must be at expect_sr (resampled) or target_sr (copied).
    Returns (batch, lengths, status)."""
    from ..ops.resample import design_lowpass

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    n = len(paths)
    g = math.gcd(expect_sr, target_sr)
    up, down = target_sr // g, expect_sr // g
    taps = np.ascontiguousarray(design_lowpass(up, down), np.float64)
    out = np.zeros((n, stride), np.float32)
    lengths = np.zeros(n, np.int64)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.asttts_load_batch(
        arr, n, target_sr, expect_sr,
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(taps),
        up, down, _fptr(out), stride,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    return out, lengths, status


def load_wav_fast(path: str, target_sr: int) -> np.ndarray:
    """Drop-in for utils.audio_io.load_wav using the native path when
    available (decode + resample in C++), Python fallback otherwise."""
    if available():
        try:
            x, sr = read_wav_native(path)
            if sr == target_sr:
                return x
            return resample_native(x, sr, target_sr)
        except Exception:
            pass
    from .audio_io import load_wav

    return load_wav(path, target_sr)
