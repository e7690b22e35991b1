"""Dependency-free ONNX weight extraction (protobuf wire parser).

The reference ran its speech tokenizer and CAM++ speaker encoder as ONNX
models (speech_tokenizer_v1.onnx, campplus.onnx — SURVEY §2.3.1/§2.3.4
rows 3-4) via ONNX Runtime. This environment ships no `onnx` package, so
the converter (utils/cosyvoice_convert.py) reads the initializer tensors
straight off the protobuf wire format:

  ModelProto.graph (field 7) -> GraphProto.initializer (field 5, repeated
  TensorProto) -> {dims=1, data_type=2, float_data=4, int64_data=7, name=8,
  raw_data=9}

Only weights are extracted — the compute graph is re-expressed natively in
JAX (we never interpret ONNX ops; that would be a CPU emulator, not a TPU
framework). write_onnx_tensors() emits a minimal valid file for tests.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np

# TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload-bytes) over a message."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            v, i = _read_varint(buf, i)
            yield fno, wt, v.to_bytes((v.bit_length() + 7) // 8 or 1, "little")
        elif wt == _WT_I64:
            yield fno, wt, buf[i : i + 8]
            i += 8
        elif wt == _WT_LEN:
            ln, i = _read_varint(buf, i)
            yield fno, wt, buf[i : i + ln]
            i += ln
        elif wt == _WT_I32:
            yield fno, wt, buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at offset {i}")


def _varint_value(payload: bytes) -> int:
    return int.from_bytes(payload, "little")


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = 1
    name = ""
    raw = b""
    floats: List[bytes] = []
    int64s: List[bytes] = []
    for fno, wt, payload in _fields(buf):
        if fno == 1:   # dims (varint or packed)
            if wt == _WT_VARINT:
                dims.append(_varint_value(payload))
            else:
                i = 0
                while i < len(payload):
                    v, i = _read_varint(payload, i)
                    dims.append(v)
        elif fno == 2:
            dtype = _varint_value(payload)
        elif fno == 4:  # float_data (packed or repeated i32)
            floats.append(payload)
        elif fno == 7:  # int64_data
            int64s.append(payload)
        elif fno == 8:
            name = payload.decode("utf-8")
        elif fno == 9:
            raw = payload
    np_dtype = _DTYPES.get(dtype)
    if np_dtype is None:
        raise ValueError(f"tensor {name!r}: unsupported data_type {dtype}")
    if raw:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif floats:
        arr = np.frombuffer(b"".join(floats), dtype=np.float32).astype(np_dtype)
    elif int64s:
        vals = []
        for chunk in int64s:
            i = 0
            while i < len(chunk):
                v, i = _read_varint(chunk, i)
                vals.append(v)
        arr = np.asarray(vals, np.int64).astype(np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr


def load_onnx_weights(path) -> Dict[str, np.ndarray]:
    """ONNX file -> {initializer name: ndarray}."""
    buf = Path(path).read_bytes()
    out: Dict[str, np.ndarray] = {}
    for fno, wt, payload in _fields(buf):          # ModelProto
        if fno == 7 and wt == _WT_LEN:             # graph
            for g_fno, g_wt, g_payload in _fields(payload):   # GraphProto
                if g_fno == 5 and g_wt == _WT_LEN:  # initializer
                    name, arr = _parse_tensor(g_payload)
                    out[name] = arr
    return out


# --------------------------------------------------------------- test writer


def _emit_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _emit_field(fno: int, wt: int, payload: bytes) -> bytes:
    head = _emit_varint((fno << 3) | wt)
    if wt == _WT_LEN:
        return head + _emit_varint(len(payload)) + payload
    return head + payload


def write_onnx_tensors(path, tensors: Dict[str, np.ndarray]) -> None:
    """Emit a minimal ModelProto containing only graph.initializer entries
    (round-trip fixture for load_onnx_weights; also what a real exporter's
    weight section looks like on the wire)."""
    inits = b""
    rev_dtype = {np.dtype(v): k for k, v in _DTYPES.items()}
    for name, arr in tensors.items():
        t = b""
        for d in arr.shape:
            t += _emit_field(1, _WT_VARINT, _emit_varint(int(d)))
        t += _emit_field(2, _WT_VARINT, _emit_varint(rev_dtype[arr.dtype]))
        t += _emit_field(8, _WT_LEN, name.encode("utf-8"))
        t += _emit_field(9, _WT_LEN, np.ascontiguousarray(arr).tobytes())
        inits += _emit_field(5, _WT_LEN, t)
    graph = inits + _emit_field(2, _WT_LEN, b"g")
    model = _emit_field(7, _WT_LEN, graph)
    Path(path).write_bytes(model)
