"""Oracle engine registry — parity ground truth for the array engine."""
from __future__ import annotations

from typing import Callable, Dict

from .envs import IslandOracle, ShiftOracle, SokobanOracle
from .runner import OracleEnv, OracleRunner

ORACLE_REGISTRY: Dict[str, Callable[..., OracleEnv]] = {
    "shift": ShiftOracle,
    "shift-test": lambda: ShiftOracle(testing=True),
    "island": IslandOracle,
    "sokoban": SokobanOracle,
}


def make_oracle(alias: str, **kwargs) -> OracleEnv:
    if alias not in ORACLE_REGISTRY:
        raise KeyError(f"no oracle for env alias {alias!r}")
    return ORACLE_REGISTRY[alias](**kwargs)


__all__ = ["ORACLE_REGISTRY", "make_oracle", "OracleEnv", "OracleRunner"]
