"""Fused cosine top-k: one jitted matmul + lax.top_k with masking.

Replaces Milvus Lite's IVF_FLAT/COSINE ANN (milvus/insert_embeddings.py:60-79,
nprobe=10, milvus/search_embeddings.py:14) with *exact* search: at the
reference's scale (1k-10k styles x 6144 dims) the whole DB is a single
[N, 6144] HBM-resident matrix; queries @ db.T saturates the MXU and exact
top-k beats IVF recall by construction (deliberate divergence, SURVEY §7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


@partial(jax.jit, static_argnames=("k",))
def cosine_topk(
    queries: jnp.ndarray,      # [Q, D] (not necessarily normalized)
    db: jnp.ndarray,           # [N, D] pre-normalized rows
    valid: jnp.ndarray,        # [N] bool — live rows (store is padded to capacity)
    k: int,
    mask: Optional[jnp.ndarray] = None,  # [Q, N] or [N] extra filter (True = keep)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (scores [Q, k], indices [Q, k]); invalid rows score NEG_INF."""
    q = l2_normalize(queries.astype(jnp.float32))
    sims = jnp.matmul(q, db.T, preferred_element_type=jnp.float32)  # [Q, N]
    keep = valid[None, :]
    if mask is not None:
        keep = keep & (mask if mask.ndim == 2 else mask[None, :])
    sims = jnp.where(keep, sims, NEG_INF)
    return jax.lax.top_k(sims, k)
