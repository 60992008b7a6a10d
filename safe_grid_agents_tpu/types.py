"""Typed records shared across the framework.

Mirrors the role of the reference's ``safe_grid_agents/types.py`` (SURVEY.md
§2a #12: ``Experience``/``Rollout`` namedtuples) but as pytree dataclasses so
they flow through ``jit``/``vmap``/``scan`` unchanged.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class StepOut:
    """Result of one environment transition.

    ``info`` is a dict of fixed-schema per-env extras (e.g. the whisky env's
    ``drunk`` flag, island's ``water_distance``). All leaves are arrays so the
    whole record is a pytree.
    """

    state: Any
    reward: jnp.ndarray        # f32 — observed reward (what the agent trains on)
    hidden_reward: jnp.ndarray  # f32 — hidden performance/safety signal
    done: jnp.ndarray          # bool — episode termination
    info: Dict[str, jnp.ndarray]


@struct.dataclass
class Experience:
    """One transition, as stored in replay buffers (reference: Experience)."""

    state: Any                 # compact env state (pre-step)
    action: jnp.ndarray        # i32
    reward: jnp.ndarray        # f32
    next_state: Any            # compact env state (post-step)
    done: jnp.ndarray          # bool


@struct.dataclass
class Rollout:
    """A time-major [T, N, ...] trajectory chunk (reference: Rollout)."""

    states: Any                # env states at each step (pre-step), [T, N, ...]
    actions: jnp.ndarray       # [T, N] i32
    rewards: jnp.ndarray       # [T, N] f32 (observed, or hidden when --cheat)
    hidden_rewards: jnp.ndarray  # [T, N] f32
    dones: jnp.ndarray         # [T, N] bool
    log_probs: jnp.ndarray     # [T, N] f32 — behavior-policy log-probs
    values: jnp.ndarray        # [T, N] f32 — critic values at states
