"""StyleStore — the in-HBM vector database replacing Milvus Lite.

Reference capabilities covered (SURVEY §2.3.3):
- collection create/drop + schema {id INT64 auto, file_id VARCHAR, vector
  FLOAT_VECTOR(6144), text VARCHAR} (milvus/insert_embeddings.py:43-80)
- COSINE metric search with limit/filter/output_fields (RAG.py:383-391)
- insert (insert_embeddings.py:519)
- persistence (milvus_demo.db) -> npz snapshot + JSON metadata sidecar

Design: a static-capacity [N, D] float32 matrix of L2-normalized rows lives in
HBM; `valid` marks live rows so searches never recompile as the DB grows.
Search is one jitted matmul+top_k (ops/topk.py). Inserts write rows via
device-side dynamic_update_slice with buffer donation. Metadata (file_id,
text, speaker, plus optional precomputed speech tokens for the zero-host-trip
pipeline) stays host-side, keyed by row index.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import cosine_topk, l2_normalize

PathLike = Union[str, Path]


@dataclass
class SearchHit:
    """One search result (mirrors the Milvus hit dict the reference consumed:
    id / distance / entity{file_id, text} — milvus/search_embeddings.py:33-45)."""

    index: int
    distance: float
    file_id: str
    text: str
    extras: Dict[str, Any]


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
def _write_rows(db, valid, rows, row_start):
    rows = l2_normalize(rows.astype(jnp.float32))
    db = jax.lax.dynamic_update_slice(db, rows, (row_start, 0))
    ones = jnp.ones((rows.shape[0],), dtype=bool)
    valid = jax.lax.dynamic_update_slice(valid, ones, (row_start,))
    return db, valid


class StyleStore:
    def __init__(self, dim: int, capacity: int = 4096):
        self.dim = int(dim)
        self.capacity = int(capacity)
        self.db = jnp.zeros((self.capacity, self.dim), jnp.float32)
        self.valid = jnp.zeros((self.capacity,), bool)
        self.meta: List[Dict[str, Any]] = []
        # Optional precomputed per-row arrays (speech tokens, prompt mel,
        # speaker embedding, ...) so serving never reloads style wavs
        # (SURVEY §7 hard part 5). name -> [N, ...] array aligned with rows.
        self.artifacts: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------ insert

    def __len__(self) -> int:
        return len(self.meta)

    def insert(
        self,
        vectors: np.ndarray,                    # [n, dim]
        metadata: Sequence[Dict[str, Any]],     # n dicts with file_id/text/...
    ) -> List[int]:
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        n = vectors.shape[0]
        if vectors.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {vectors.shape[1]} != {self.dim}")
        if len(metadata) != n:
            raise ValueError("metadata length mismatch")
        start = len(self.meta)
        if start + n > self.capacity:
            self._grow(max(self.capacity * 2, start + n))
        self.db, self.valid = _write_rows(
            self.db, self.valid, jnp.asarray(vectors), start
        )
        ids = list(range(start, start + n))
        for m in metadata:
            self.meta.append(dict(m))
        return ids

    def _grow(self, new_capacity: int) -> None:
        db = np.zeros((new_capacity, self.dim), np.float32)
        valid = np.zeros((new_capacity,), bool)
        db[: self.capacity] = np.asarray(self.db)
        valid[: self.capacity] = np.asarray(self.valid)
        self.capacity = new_capacity
        self.db = jnp.asarray(db)
        self.valid = jnp.asarray(valid)

    def drop(self) -> None:
        """Reference: client.drop_collection (insert_embeddings.py:36-41)."""
        self.db = jnp.zeros_like(self.db)
        self.valid = jnp.zeros_like(self.valid)
        self.meta = []
        self.artifacts = {}  # stale prompt caches must not outlive their rows

    # ------------------------------------------------------------------ search

    def search_arrays(
        self, queries: np.ndarray, k: int, mask: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Device search: [Q, dim] -> (scores [Q, k], row indices [Q, k])."""
        q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        m = None if mask is None else jnp.asarray(mask)
        scores, idx = cosine_topk(q, self.db, self.valid, k, m)
        return np.asarray(scores), np.asarray(idx)

    def search(
        self,
        queries: np.ndarray,
        k: int = 1,
        speaker: Optional[str] = None,
    ) -> List[List[SearchHit]]:
        """Host-facing search with metadata join + optional speaker filter
        (Milvus `filter` equivalent, evaluated as a device-side mask)."""
        mask = None
        if speaker is not None:
            mask = np.zeros((self.capacity,), bool)
            for i, m in enumerate(self.meta):
                mask[i] = m.get("speaker") == speaker
        scores, idx = self.search_arrays(queries, k, mask)
        out: List[List[SearchHit]] = []
        for qi in range(scores.shape[0]):
            hits = []
            for ki in range(k):
                row = int(idx[qi, ki])
                sc = float(scores[qi, ki])
                if row >= len(self.meta) or sc <= -1e29:
                    continue
                m = self.meta[row]
                hits.append(
                    SearchHit(
                        index=row,
                        distance=sc,
                        file_id=str(m.get("file_id", "")),
                        text=str(m.get("text", m.get("zh_text", ""))),
                        extras={
                            k2: v for k2, v in m.items()
                            if k2 not in ("file_id", "text")
                        },
                    )
                )
            out.append(hits)
        return out

    # ------------------------------------------------------------------ persistence

    def save(self, path: PathLike) -> None:
        """Snapshot = vectors.npz + metadata JSON sidecar (replaces the SQLite
        .db file, milvus/milvus_demo.db)."""
        base = str(path).removesuffix(".npz")
        Path(base).parent.mkdir(parents=True, exist_ok=True)
        n = len(self.meta)
        arrays = {f"artifact_{k}": v for k, v in self.artifacts.items()}
        np.savez(
            base + ".npz",
            db=np.asarray(self.db[:n]),
            dim=np.int64(self.dim),
            capacity=np.int64(self.capacity),
            **arrays,
        )
        with open(base + ".meta.json", "w", encoding="utf-8") as f:
            json.dump(self.meta, f, ensure_ascii=False)

    @classmethod
    def load(cls, path: PathLike) -> "StyleStore":
        base = str(path).removesuffix(".npz")
        data = np.load(base + ".npz")
        with open(base + ".meta.json", encoding="utf-8") as f:
            meta = json.load(f)
        store = cls(int(data["dim"]), int(data["capacity"]))
        rows = data["db"]
        if rows.shape[0]:
            store.db, store.valid = _write_rows(
                store.db, store.valid, jnp.asarray(rows), 0
            )
        store.meta = meta
        store.artifacts = {
            k[len("artifact_"):]: data[k]
            for k in data.files if k.startswith("artifact_")
        }
        return store

    # ------------------------------------------------------------------ verification

    def self_verify(
        self, sample: Optional[int] = None, tol: float = 1e-4,
        chunk: int = 1024,
    ) -> bool:
        """Insert self-check: searching each stored vector returns a perfect
        (cosine = 1) top-1 hit (reference: insert_embeddings.py:544-584 —
        the reference verified EVERY inserted vector; so do we by default).
        `sample=None` verifies all rows, chunked so the [Q, N] score matrix
        stays bounded; an int verifies the LAST `sample` rows (the most
        recently inserted batch — the rows an insert could have corrupted).
        Ties are allowed — distinct rows can hold identical vectors (same
        speaker + same emotion label yields the same combined embedding)."""
        n = len(self.meta)
        if n == 0:
            return True
        lo = 0 if sample is None else max(0, n - min(sample, n))
        for s0 in range(lo, n, chunk):
            s1 = min(s0 + chunk, n)
            rows = np.asarray(self.db[s0:s1])
            scores, idx = self.search_arrays(rows, k=1)
            exact = idx[:, 0] == np.arange(s0, s1)
            tied = scores[:, 0] >= 1.0 - tol
            if not (exact | tied).all():
                return False
        return True
