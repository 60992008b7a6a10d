"""Agent contracts.

The reference defines mixin ABCs ``BaseActor.act``, ``BaseLearner.learn``,
``BaseExplorer.act_explore`` (SURVEY.md §2a #6). Here the same contract is
functional: an agent object is *static* configuration bound to an env, its
mutable quantities live in an ``AgentState`` pytree, and every method is pure
so the training loops can fuse act→step→learn into one jitted program.

Shapes: all act/learn methods are batched over N env instances (the
vectorized runtime is the only runtime — N=1 recovers the reference's
single-env behavior).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..envs.base import Env


class Agent:
    """Base: static config + pure functions over (AgentState, batch)."""

    name: str = "agent"

    def __init__(self, env: Env):
        self.env = env

    def init(self, key) -> Any:
        """Build the initial AgentState (params, tables, buffers...)."""
        raise NotImplementedError

    def act(self, astate: Any, env_states: Any, key) -> jnp.ndarray:
        """Greedy actions [N] for stacked env states (BaseActor.act)."""
        raise NotImplementedError

    def act_explore(self, astate: Any, env_states: Any, key) -> jnp.ndarray:
        """Exploratory actions [N] (BaseExplorer.act_explore)."""
        return self.act(astate, env_states, key)

    def for_env(self, env: Env) -> "Agent":
        """A shallow copy of this agent bound to a different (shape-
        compatible) env — used by the distributional-shift eval protocol
        (train on one layout, evaluate on the shifted one): observation
        rendering and state indexing must come from the EVAL env."""
        import copy

        import jax

        c = copy.copy(self)
        c.env = env
        if hasattr(c, "_v_observe"):
            c._v_observe = jax.vmap(env.observe)
        if hasattr(c, "_v_index"):
            c._v_index = jax.vmap(env.state_index)
        return c
