"""Fused tabular Q-learning trainer (reference learn.py::tabq_learn,
SURVEY.md §2a #3): act-explore → env.step → Q update, scanned on device."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..agents.tabular import TabularQAgent, TabularQState
from ..envs.vec import VecEnv, VecState
from .common import ChunkStats, eval_chunk, reward_source


class TabularQTrainer:
    def __init__(self, agent: TabularQAgent, vec: VecEnv, cheat: bool = False):
        self.agent = agent
        self.vec = vec
        self.cheat = cheat
        self._v_index = jax.vmap(vec.env.state_index)

    def init(self, key) -> Tuple[TabularQState, VecState]:
        ka, kv = jax.random.split(key)
        return self.agent.init(ka), self.vec.reset(kv)

    def train_chunk(
        self,
        astate: TabularQState,
        vstate: VecState,
        key,
        n_steps: int,
        axis_name: str | None = None,
    ) -> Tuple[TabularQState, VecState, ChunkStats]:
        agent, vec = self.agent, self.vec

        def body(carry, _):
            astate, vs, k, stats = carry
            k, ka = jax.random.split(k)
            s_idx = self._v_index(vs.env)
            actions = agent.act_explore(astate, vs.env, ka)
            vs, out = vec.step(vs, actions)
            next_idx = self._v_index(out.pre_reset_env)
            astate = agent.learn(
                astate,
                s_idx,
                actions,
                reward_source(out, self.cheat),
                next_idx,
                out.done,
                axis_name=axis_name,
            )
            return (astate, vs, k, stats.accumulate(out)), None

        (astate, vstate, _, stats), _ = jax.lax.scan(
            body, (astate, vstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return astate, vstate, stats

    def eval_chunk(self, astate, vstate, key, n_steps, min_episodes=None):
        return eval_chunk(
            self.vec, self.agent.act, astate, vstate, key, n_steps,
            min_episodes=min_episodes,
        )
