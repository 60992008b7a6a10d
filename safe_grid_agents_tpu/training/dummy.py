"""Trainer for non-learning baseline agents (random / single-action):
pure rollout with episode accounting — used to sanity-check envs and the
metric plumbing, like the reference's dummy agents (SURVEY.md §2a #7)."""
from __future__ import annotations

from typing import Tuple

import jax

from ..envs.vec import VecEnv, VecState
from .common import ChunkStats, eval_chunk


class DummyTrainer:
    def __init__(self, agent, vec: VecEnv, cheat: bool = False):
        del cheat
        self.agent = agent
        self.vec = vec

    def init(self, key):
        ka, kv = jax.random.split(key)
        return self.agent.init(ka), self.vec.reset(kv)

    def train_chunk(
        self, astate, vstate: VecState, key, n_steps: int, axis_name=None
    ):
        del axis_name  # nothing to learn → nothing to synchronize
        def body(carry, _):
            vs, k, stats = carry
            k, ka = jax.random.split(k)
            actions = self.agent.act_explore(astate, vs.env, ka)
            vs, out = self.vec.step(vs, actions)
            return (vs, k, stats.accumulate(out)), None

        (vstate, _, stats), _ = jax.lax.scan(
            body, (vstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return astate, vstate, stats

    def eval_chunk(self, astate, vstate, key, n_steps, min_episodes=None):
        return eval_chunk(
            self.vec, self.agent.act, astate, vstate, key, n_steps,
            min_episodes=min_episodes,
        )
