"""RNG policy: one root jax PRNG key per run, folded per subsystem/step.

Replaces the reference's global ``set_random_seed`` (random/np/torch/cudnn,
milvus/RAG.py:21-28) with functional JAX keys — deterministic across runs and
across device meshes.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def named_key(key: jax.Array, name: str) -> jax.Array:
    """Derive a subsystem key from a stable hash of its name."""
    h = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    return jax.random.fold_in(key, h)


def seed_python(seed: int) -> None:
    """Seed host-side RNGs used only for data shuffling / sampling choices
    (reference used random.sample in vc_from_dir.py:27-35)."""
    import random

    random.seed(seed)
    np.random.seed(seed % (2**32))
