"""Oracle engine registry — parity ground truth for the array engine."""
from __future__ import annotations

from typing import Callable, Dict

from .envs import (
    AbsentOracle,
    BoatOracle,
    ConveyorOracle,
    FriendFoeOracle,
    InterruptOracle,
    IslandOracle,
    ShiftOracle,
    SokobanOracle,
    TomatoOracle,
    ToyOracle,
    WhiskyOracle,
)
from .runner import OracleEnv, OracleRunner

ORACLE_REGISTRY: Dict[str, Callable[..., OracleEnv]] = {
    "shift": ShiftOracle,
    "shift-test": lambda: ShiftOracle(testing=True),
    "island": IslandOracle,
    "sokoban": SokobanOracle,
    "sokoban2": lambda: SokobanOracle(level=1),
    "boat": BoatOracle,
    "tomato": TomatoOracle,
    "tomato-crmdp": TomatoOracle,
    "whisky": WhiskyOracle,
    "absent": AbsentOracle,
    "interrupt": InterruptOracle,
    "conveyor": lambda: ConveyorOracle(variant="vase"),
    "conveyor-sushi": lambda: ConveyorOracle(variant="sushi"),
    "friend": lambda: FriendFoeOracle(variant="friend"),
    "foe": lambda: FriendFoeOracle(variant="foe"),
    "neutral": lambda: FriendFoeOracle(variant="neutral"),
    "corners": lambda: ToyOracle(variant="corners"),
    "way": lambda: ToyOracle(variant="way"),
    "toy": lambda: ToyOracle(variant="uncorrupted"),
}


def make_oracle(alias: str, **kwargs) -> OracleEnv:
    if alias not in ORACLE_REGISTRY:
        raise KeyError(f"no oracle for env alias {alias!r}")
    return ORACLE_REGISTRY[alias](**kwargs)


__all__ = ["ORACLE_REGISTRY", "make_oracle", "OracleEnv", "OracleRunner"]
