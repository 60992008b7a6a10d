"""Environment registry.

Mirrors the reference's ``ENV_MAP`` alias dict (SURVEY.md §2a #2): alias →
constructor; aliases follow SURVEY.md §2c. ``make_env(alias)`` builds the
array engine; the matching oracle comes from
``safe_grid_agents_tpu.oracle.make_oracle``.
"""
from __future__ import annotations

from typing import Callable, Dict

from .absent_supervisor import AbsentSupervisor
from .base import Env
from .boat_race import BoatRace
from .conveyor_belt import ConveyorBelt
from .distributional_shift import DistributionalShift
from .friend_foe import FriendFoe
from .interruptibility import SafeInterruptibility
from .island_navigation import IslandNavigation
from .sokoban import Sokoban
from .tomato import TomatoCRMDP, TomatoWatering
from .toy import ToyGridworld
from .whisky_gold import WhiskyGold

ENV_REGISTRY: Dict[str, Callable[..., Env]] = {
    "shift": DistributionalShift,
    "shift-test": lambda: DistributionalShift(testing=True),
    "island": IslandNavigation,
    "sokoban": Sokoban,
    "sokoban2": lambda: Sokoban(level=1),
    "boat": BoatRace,
    "tomato": TomatoWatering,
    "tomato-crmdp": TomatoCRMDP,
    "whisky": WhiskyGold,
    "absent": AbsentSupervisor,
    "interrupt": SafeInterruptibility,
    "conveyor": lambda: ConveyorBelt(variant="vase"),
    "conveyor-sushi": lambda: ConveyorBelt(variant="sushi"),
    "friend": lambda: FriendFoe(variant="friend"),
    "foe": lambda: FriendFoe(variant="foe"),
    "neutral": lambda: FriendFoe(variant="neutral"),
    "corners": lambda: ToyGridworld(variant="corners"),
    "way": lambda: ToyGridworld(variant="way"),
    "toy": lambda: ToyGridworld(variant="uncorrupted"),
}


def make_env(alias: str, compiled: bool = False, **kwargs) -> Env:
    """Build an env by alias. ``compiled=True`` lowers it to the lookup-table
    engine (envs/compiled.py) — bitwise-identical semantics, pure-gather
    steps; only enumerable-deterministic envs support it."""
    if alias not in ENV_REGISTRY:
        raise KeyError(f"unknown env alias {alias!r}; known: {sorted(ENV_REGISTRY)}")
    if compiled:
        from .compiled import COMPILE_SUBSTITUTE, COMPILEABLE, compile_env

        if alias not in COMPILEABLE:
            raise ValueError(
                f"{alias!r} is not compileable (stochastic per-step dynamics "
                f"or unbounded cross-episode state); compileable: {COMPILEABLE}"
            )
        if alias in COMPILE_SUBSTITUTE:
            # friend/foe/neutral: build the bounded-memory adversary
            # DIRECTLY (the finite-state formulation, bitwise-equal to the
            # array engine within its episode bound — envs/friend_foe.py);
            # kwargs such as ``cap`` go to the substitute, and the unbounded
            # registry env is never constructed just to be discarded.
            return compile_env(COMPILE_SUBSTITUTE[alias](**kwargs))
        return compile_env(ENV_REGISTRY[alias](**kwargs))
    return ENV_REGISTRY[alias](**kwargs)
