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


def _q_rows(q, idx):
    """Q[idx] as a one-hot matmul — exact row reads (each dot selects one
    table entry), bitwise-identical to the gather, ~3 µs vs ~23 µs at N=4096."""
    oh = jax.nn.one_hot(idx, q.shape[0], dtype=q.dtype)
    return jnp.matmul(oh, q, precision=jax.lax.Precision.HIGHEST)


def _learn_matmul(
    agent: TabularQAgent, astate: TabularQState,
    s_idx, actions, rewards, next_idx, dones,
    axis_name: str | None = None,
) -> TabularQState:
    """``TabularQAgent.learn`` re-expressed as one-hot matmuls.

    Same duplicate-averaged batched TD (docstring in agents/tabular.py), but
    the per-step [S, A] scatter-adds and row gathers — ~50 µs of real device
    time at N=4096 — become four tiny MXU matmuls (~3 µs each):

        q_next  = onehot(next_idx) @ Q            (row reads — exact)
        q_sa    = ((onehot(s) @ Q) * onehot(a)).sum(-1)
        td_sum  = onehot(s).T @ (onehot(a) * td)  (scatter-accumulate)
        cnt     = onehot(s).T @ onehot(a)

    One-hot row dots are exact table reads; the accumulation matmuls sum the
    same TD terms as the scatter, in a different float association — values
    match the scatter version to float-sum reassociation (ints exactly), and
    the learning-curve tests reach the identical optimum."""
    q = astate.q
    S, A = q.shape
    hi = jax.lax.Precision.HIGHEST
    q_next = _q_rows(q, next_idx)                                   # [N, A]
    target = rewards + agent.discount * jnp.where(
        dones, 0.0, q_next.max(-1)
    )
    oh_s = jax.nn.one_hot(s_idx, S, dtype=q.dtype)
    oh_a = jax.nn.one_hot(actions, A, dtype=q.dtype)
    q_sa = (jnp.matmul(oh_s, q, precision=hi) * oh_a).sum(-1)
    td = target - q_sa
    td_sum = jnp.matmul(oh_s.T, oh_a * td[:, None], precision=hi)   # [S, A]
    cnt = jnp.matmul(oh_s.T, oh_a, precision=hi)
    n = jnp.int32(s_idx.shape[0])
    if axis_name is not None:
        td_sum = jax.lax.psum(td_sum, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
        n = jax.lax.psum(n, axis_name)
    delta = agent.lr * td_sum / jnp.maximum(cnt, 1.0)
    return TabularQState(q=q + delta, step=astate.step + n)


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
            # ε-greedy with the greedy read as a one-hot matmul (same draws
            # as agent.act_explore_idx, same argmax — identical actions).
            k1, k2 = jax.random.split(ka)
            greedy = jnp.argmax(_q_rows(astate.q, s_idx), -1).astype(jnp.int32)
            rand = jax.random.randint(k1, s_idx.shape, 0, agent.env.n_actions)
            explore = jax.random.bernoulli(
                k2, agent.current_epsilon(astate.step), s_idx.shape
            )
            actions = jnp.where(explore, rand, greedy)
            st, out = self.vec.step(st, actions)
            astate = _learn_matmul(
                agent,
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

    def eval_chunk(self, astate, mstate, key, n_steps, min_episodes=None):
        from .common import eval_chunk

        def act(astate, st, ka):
            del ka
            return jnp.argmax(_q_rows(astate.q, st.idx), -1).astype(jnp.int32)

        return eval_chunk(
            self.vec, act, astate, mstate, key, n_steps,
            min_episodes=min_episodes,
            state_view=lambda st: st, accumulate=_accumulate,
        )
