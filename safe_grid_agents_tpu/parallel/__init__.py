"""Sharding runtime: mesh construction + the two multi-device trainer
wrappers (explicit-collective shard_map DP, GSPMD dp×tp)."""
from .dp import DPTrainer
from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated
from .tp import GSPMDTrainer, tp_param_specs

__all__ = [
    "DPTrainer",
    "GSPMDTrainer",
    "tp_param_specs",
    "make_mesh",
    "data_sharding",
    "replicated",
    "DATA_AXIS",
    "MODEL_AXIS",
]
