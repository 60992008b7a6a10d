"""Sharding runtime: mesh construction, the two multi-device trainer
wrappers (explicit-collective shard_map DP, GSPMD dp×tp), and the executed
parallelism-matrix demos (pipeline ``pp``, expert ``ep``, sequence/ring-
attention ``sp``)."""
from . import ep, pp, sp
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
    "pp",
    "ep",
    "sp",
]
