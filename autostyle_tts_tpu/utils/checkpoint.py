"""Checkpoint save/restore for param pytrees + train state.

Replaces HF Trainer checkpointing (save_steps=50, save_total_limit=1,
resume_from_checkpoint — src/ft_llm.py:271-281,315). Uses orbax when present,
with a dependency-free msgpack/npz fallback so inference-only deployments
don't need orbax.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Optional, Union

import jax
import numpy as np

PathLike = Union[str, Path]

_FLAT_SEP = "/"


def _flatten(tree: Any) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _FLAT_SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p: Any) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_pytree(path: PathLike, tree: Any, metadata: Optional[dict] = None) -> None:
    """Save a pytree of arrays as an .npz + structure sidecar."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(tree)
    np.savez(path, **flat)
    meta = dict(metadata or {})
    meta["keys"] = sorted(flat.keys())
    with open(str(path) + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)


def load_pytree(path: PathLike, like: Any) -> Any:
    """Load into the structure of `like` (keys matched by flattened path)."""
    data = np.load(str(path) if str(path).endswith(".npz") else str(path) + ".npz")
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in paths:
        key = _FLAT_SEP.join(_path_str(x) for x in p)
        if key not in data:
            raise KeyError(f"checkpoint missing key {key!r}")
        arr = data[key]
        if hasattr(leaf, "dtype"):
            arr = arr.astype(leaf.dtype)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """step-numbered checkpoints with save_total_limit + latest discovery.

    backend='npz' (default): single-host portable .npz pytrees.
    backend='orbax': orbax.checkpoint PyTree handler — sharded/distributed
    array support for multi-host training (HF Trainer save_steps equivalent
    was single-host too; orbax is the TPU-native upgrade path)."""

    def __init__(self, directory: PathLike, save_total_limit: int = 1,
                 backend: str = "npz"):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.limit = save_total_limit
        assert backend in ("npz", "orbax"), backend
        self.backend = backend
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._orbax = ocp.PyTreeCheckpointer()

    def _ckpts(self):
        out = []
        for p in self.dir.glob("checkpoint-*"):
            m = re.fullmatch(r"checkpoint-(\d+)", p.name)
            if m:
                out.append((int(m.group(1)), p))
        return sorted(out)

    def save(self, step: int, tree: Any, metadata: Optional[dict] = None) -> Path:
        d = self.dir / f"checkpoint-{step}"
        if self.backend == "orbax":
            import jax

            self._orbax.save(
                (d / "state.orbax").absolute(),
                jax.tree_util.tree_map(lambda x: x, tree),
            )
            d.mkdir(parents=True, exist_ok=True)
            (d / "metadata.json").write_text(
                __import__("json").dumps({"step": step, **(metadata or {})})
            )
        else:
            d.mkdir(parents=True, exist_ok=True)
            save_pytree(d / "state.npz", tree,
                        metadata={"step": step, **(metadata or {})})
        for _, old in self._ckpts()[: -self.limit] if self.limit else []:
            shutil.rmtree(old, ignore_errors=True)
        return d

    def latest_step(self) -> Optional[int]:
        ck = self._ckpts()
        return ck[-1][0] if ck else None

    def restore(self, like: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        d = self.dir / f"checkpoint-{step}"
        if (d / "state.orbax").exists():
            import orbax.checkpoint as ocp

            orbax = self._orbax or ocp.PyTreeCheckpointer()
            return orbax.restore((d / "state.orbax").absolute(), item=like)
        return load_pytree(d / "state.npz", like)
