"""Device-mesh construction.

SURVEY.md §2d/§5: the sharding runtime uses a ``('data', 'model')`` mesh —
env instances shard over ``data`` (collectives ride ICI); ``model`` is the
reserved tensor-parallel axis so TP PartitionSpecs are expressible even
though gridworld-scale nets never need it (documented design decision, not
an omission). Multi-host processes join via ``jax.distributed.initialize``
before calling ``make_mesh`` (each host contributes its local devices).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_1d_mesh(axis_name: str, n: int, devices=None) -> Mesh:
    """Single-axis mesh over the first ``n`` devices (used by the pp/ep/sp
    parallelism demos for their ``stage``/``expert``/``seq`` axes)."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n, f"{len(devices)} devices < {n} for '{axis_name}'"
    return Mesh(np.array(devices[:n]), (axis_name,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (env instances)."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
