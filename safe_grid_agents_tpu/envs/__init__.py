"""Environment registry.

Mirrors the reference's ``ENV_MAP`` alias dict (SURVEY.md §2a #2): alias →
constructor. ``make_env(alias)`` builds the array engine; the matching oracle
comes from ``safe_grid_agents_tpu.oracle.make_oracle``.
"""
from __future__ import annotations

from typing import Callable, Dict

from .base import Env
from .distributional_shift import DistributionalShift
from .island_navigation import IslandNavigation
from .sokoban import Sokoban

ENV_REGISTRY: Dict[str, Callable[..., Env]] = {
    "shift": DistributionalShift,
    "shift-test": lambda: DistributionalShift(testing=True),
    "island": IslandNavigation,
    "sokoban": Sokoban,
}


def make_env(alias: str, **kwargs) -> Env:
    if alias not in ENV_REGISTRY:
        raise KeyError(f"unknown env alias {alias!r}; known: {sorted(ENV_REGISTRY)}")
    return ENV_REGISTRY[alias](**kwargs)
