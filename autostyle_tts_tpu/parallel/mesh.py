"""Device mesh construction (data x model axes).

The reference's only parallelism was shell-level GPU pinning plus accelerate
device_map="auto" (SURVEY §2.2). TPU-native equivalent: one 2-D logical mesh;
the data axis shards request batches, the model axis shards attention heads /
MLP (GSPMD). Collectives ride ICI within a slice; XLA inserts them from the
shardings — no explicit NCCL-style calls anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def best_mesh_shape(n_devices: int, model_parallel: Optional[int] = None) -> Tuple[int, int]:
    """Pick (data, model). Models here are <=7B and fit one chip, so default
    model=1 and scale throughput on data; an explicit model_parallel overrides."""
    if model_parallel is None:
        return (n_devices, 1)
    if n_devices % model_parallel:
        raise ValueError(f"{n_devices} devices not divisible by model={model_parallel}")
    return (n_devices // model_parallel, model_parallel)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    n = data * model
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1)
