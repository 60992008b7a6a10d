"""Sharding runtime: mesh construction + data-parallel trainer wrapper."""
from .dp import DPTrainer
from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated

__all__ = [
    "DPTrainer",
    "make_mesh",
    "data_sharding",
    "replicated",
    "DATA_AXIS",
    "MODEL_AXIS",
]
