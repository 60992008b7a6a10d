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
    """One transition, as stored in replay buffers (reference: Experience;
    used by the DQN replay path — compact env states, not boards). The
    reference's Rollout record maps to the PPO trainers' time-major [T, N]
    trajectory dict (training/ppo.py::collect), which stays a plain dict so
    CRMDP can extend its schema without a parallel type."""

    state: Any                 # compact env state (pre-step)
    action: jnp.ndarray        # i32
    reward: jnp.ndarray        # f32
    next_state: Any            # compact env state (post-step)
    done: jnp.ndarray          # bool
