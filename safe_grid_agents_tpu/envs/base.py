"""Environment base contract for the array engine.

The reference stack's contract (SURVEY.md §3.4): ``step(action) → (obs,
reward, done, info)`` with the hidden performance surfaced alongside the
observed reward. Here the contract is functional and shape-static:

* ``reset(key) -> State``                     — fresh per-instance state
* ``step(state, action, key) -> StepOut``     — pure transition
* ``observe(state) -> f32 [P, H, W]``         — one-hot plane stack
* ``board(state) -> int8 [H, W]``             — char-id board render
* ``state_index(state) -> i32`` (optional)    — perfect hash for tabular Q

States are compact (positions + scalar registers), NOT full boards: the board
is a *render* of the state, produced only when a policy needs it. This is the
key TPU-first inversion of pycolab's design — transition cost is O(1) gathers
into static spec arrays instead of O(H*W) sprite repaints.

RNG discipline (SURVEY.md §7 "hard parts"): ``step`` receives exactly one key
per call and must consume it deterministically; the oracle consumes the same
stream, which is what makes bitwise parity achievable.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..types import StepOut
from . import grid


class Env:
    """Base class. Subclasses are *static* configuration objects: their
    methods are pure functions of (state, action, key) that close over
    numpy spec arrays (baked into the XLA program as constants)."""

    name: str = "env"
    n_actions: int = grid.N_ACTIONS
    height: int = 0
    width: int = 0
    n_planes: int = 0          # planes in observe()
    max_steps: int = 100
    # Dense tabular-Q state-space size, or None if not enumerable.
    num_states: Optional[int] = None

    # -- required ----------------------------------------------------------
    def reset(self, key) -> object:
        raise NotImplementedError

    def step(self, state, action, key) -> StepOut:
        raise NotImplementedError

    def observe(self, state) -> jnp.ndarray:
        raise NotImplementedError

    def board(self, state) -> jnp.ndarray:
        raise NotImplementedError

    # -- optional ----------------------------------------------------------
    def state_index(self, state) -> jnp.ndarray:
        """Perfect hash of ``state`` into [0, num_states)."""
        raise NotImplementedError(f"{self.name} has no tabular state index")

    def carry_reset(self, state, key) -> object:
        """Reset for auto-reset boundaries. Default: plain reset. Envs with
        cross-episode persistent state (friend_foe's bandit stats) override
        this to carry those fields through."""
        del state
        return self.reset(key)

    # -- helpers -----------------------------------------------------------
    def _timeout(self, t: jnp.ndarray) -> jnp.ndarray:
        """True when the post-step step-count ``t`` hits the step limit."""
        return t >= self.max_steps

    @property
    def obs_shape(self):
        return (self.n_planes, self.height, self.width)
