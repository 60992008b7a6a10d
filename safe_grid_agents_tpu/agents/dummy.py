"""Baseline agents: random and single-action (reference dummy.py,
SURVEY.md §2a #7) — used to sanity-check envs and metric plumbing."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import Agent


@struct.dataclass
class DummyState:
    step: jnp.ndarray  # i32 — kept so the trainer contract is uniform


class RandomAgent(Agent):
    name = "random"

    def init(self, key):
        del key
        return DummyState(step=jnp.int32(0))

    def act(self, astate, env_states, key):
        n = jax.tree.leaves(env_states)[0].shape[0]
        return jax.random.randint(key, (n,), 0, self.env.n_actions)

    act_explore = act


class SingleActionAgent(Agent):
    name = "single"

    def __init__(self, env, action: int = 0):
        super().__init__(env)
        self.action = action

    def init(self, key):
        del key
        return DummyState(step=jnp.int32(0))

    def act(self, astate, env_states, key):
        del key
        n = jax.tree.leaves(env_states)[0].shape[0]
        return jnp.full((n,), self.action, jnp.int32)

    act_explore = act
