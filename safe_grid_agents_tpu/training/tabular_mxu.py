"""Tabular Q-learning over the MXU fused rollout engine.

The standard ``TabularQTrainer`` steps ``VecEnv`` (gather-pipeline engine,
~23–32 M env-steps/s) and spends roughly half its time in the env. The MXU
engine steps the same compiled tables at 1–1.5 B steps/s (PERF.md), and
tabular Q is the one learner whose entire act/learn path is *already*
index-native: act = Q[idx] argmax, learn = scatter-add TD onto the dense
[S, A] table. This trainer fuses act_explore → MXU step → duplicate-averaged
TD update in one scan, making training table-update-bound instead of
env-bound.

Semantics are identical to ``TabularQTrainer`` over VecEnv (same
``TabularQAgent.learn``; the exploration draws use a per-chunk action-key
stream like VecEnv's bench path). Supports DP via ``axis_name`` exactly like
the base trainer. CLI: ``<env> tabular-q --compiled --mxu``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..agents.tabular import TabularQAgent, TabularQState
from ..envs.mxu import MXUState, MXUVecEnv
from .common import ChunkStats


def _accumulate(stats: ChunkStats, out: dict) -> ChunkStats:
    d = out["done"].astype(jnp.float32)
    return ChunkStats(
        episodes=stats.episodes + d.sum(),
        return_sum=stats.return_sum + (d * out["finished_return"]).sum(),
        hidden_sum=stats.hidden_sum + (d * out["finished_hidden"]).sum(),
        length_sum=stats.length_sum
        + (d * out["finished_len"].astype(jnp.float32)).sum(),
        env_steps=stats.env_steps + d.shape[0],
    )


class MXUTabularQTrainer:
    """Drop-in counterpart of ``TabularQTrainer`` running on ``MXUVecEnv``."""

    def __init__(self, agent: TabularQAgent, mxu: MXUVecEnv, cheat: bool = False):
        self.agent = agent
        self.vec = mxu  # interface parity with the other trainers
        self.cheat = cheat

    def init(self, key) -> Tuple[TabularQState, MXUState]:
        ka, kv = jax.random.split(key)
        return self.agent.init(ka), self.vec.reset(kv)

    def train_chunk(
        self,
        astate: TabularQState,
        mstate: MXUState,
        key,
        n_steps: int,
        axis_name: str | None = None,
    ) -> Tuple[TabularQState, MXUState, ChunkStats]:
        agent = self.agent

        def body(carry, _):
            astate, st, k, stats = carry
            k, ka = jax.random.split(k)
            s_idx = st.idx
            actions = agent.act_explore_idx(astate, s_idx, ka)
            st, out = self.vec.step(st, actions)
            astate = agent.learn(
                astate,
                s_idx,
                actions,
                out["hidden_reward"] if self.cheat else out["reward"],
                out["next_idx"],
                out["done"],
                axis_name=axis_name,
            )
            return (astate, st, k, _accumulate(stats, out)), None

        (astate, mstate, _, stats), _ = jax.lax.scan(
            body, (astate, mstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return astate, mstate, stats

    def eval_chunk(self, astate, mstate, key, n_steps):
        agent = self.agent

        def body(carry, _):
            st, k, stats = carry
            k, ka = jax.random.split(k)
            actions = agent.act_idx(astate, st.idx, ka)
            st, out = self.vec.step(st, actions)
            return (st, k, _accumulate(stats, out)), None

        (mstate, _, stats), _ = jax.lax.scan(
            body, (mstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return mstate, stats
