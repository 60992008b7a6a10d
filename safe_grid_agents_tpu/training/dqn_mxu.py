"""DQN over the MXU fused rollout engine.

Same fused chunk as ``DQNTrainer`` (collect T steps → push → U sampled
updates) with the collect phase riding the matmul engine instead of the
gather pipeline (PERF.md: ~1.4 B vs ~32 M steps/s bare). Replay records are
``TableState`` pytrees (a state index + step counter — a few bytes per
transition); observations re-render at sample time through the compiled
env's obs-table gather, so the agent (``DQNAgent``) is unchanged: both its
MLP and table-net paths consume ``TableState`` batches natively.

Restriction: streaming (n_step == 1) collect only — the n-step window pass
needs the stacked trajectory form, which the base trainer provides; use
``DQNTrainer`` over VecEnv for --n-step > 1. CLI: ``--mxu`` with deep-q.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..agents.dqn import DQNAgent, DQNState, Transition
from ..envs.compiled import TableState
from ..envs.mxu import MXUState, MXUVecEnv
from .common import ChunkStats
from .tabular_mxu import _accumulate


class MXUDQNTrainer:
    def __init__(
        self,
        agent: DQNAgent,
        mxu: MXUVecEnv,
        cheat: bool = False,
        updates_per_chunk: int | None = None,
    ):
        assert agent.n_step == 1, (
            "MXU DQN collect is streaming-only; use DQNTrainer for --n-step > 1"
        )
        self.agent = agent
        self.vec = mxu
        self.cheat = cheat
        self.updates_per_chunk = updates_per_chunk

    def init(self, key) -> Tuple[DQNState, MXUState]:
        ka, kv = jax.random.split(key)
        return self.agent.init(ka), self.vec.reset(kv)

    def _collect(self, astate, mstate, key, n_steps: int, random_policy: bool):
        agent = self.agent

        def body(carry, _):
            astate, st, k, stats = carry
            k, ka = jax.random.split(k)
            n_local = st.idx.shape[0]
            pre = TableState(idx=st.idx, t=st.t)
            if random_policy:
                actions = jax.random.randint(
                    ka, (n_local,), 0, self.vec.A
                )
            else:
                actions = agent.act_explore(astate, pre, ka)
            st, out = self.vec.step(st, actions)
            astate = astate.replace(step=astate.step + n_local)
            # On done steps st.t is the post-reset 0; store the terminal t+1
            # the VecEnv path records via pre_reset_env (done masks the
            # bootstrap today, but keep the record faithful for any future
            # unmasked reader — n-step windows, obs statistics).
            nxt = TableState(
                idx=out["next_idx"],
                t=jnp.where(out["done"], pre.t + 1, st.t),
            )
            astate = astate.replace(
                buffer=agent.push(
                    astate.buffer,
                    Transition(
                        state=pre,
                        action=actions,
                        reward=out["hidden_reward"] if self.cheat else out["reward"],
                        next_state=nxt,
                        done=out["done"],
                    ),
                )
            )
            return (astate, st, k, _accumulate(stats, out)), None

        (astate, mstate, key, stats), _ = jax.lax.scan(
            body, (astate, mstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return astate, mstate, key, stats

    def warmup_chunk(self, astate, mstate, key, n_steps: int):
        astate, mstate, _, stats = self._collect(
            astate, mstate, key, n_steps, random_policy=True
        )
        return astate, mstate, stats

    def train_chunk(
        self, astate, mstate, key, n_steps: int, axis_name: str | None = None
    ):
        astate, mstate, key, stats = self._collect(
            astate, mstate, key, n_steps, random_policy=False
        )
        n_updates = self.updates_per_chunk or n_steps

        def update(carry, _):
            astate, k = carry
            k, ku = jax.random.split(k)
            astate, loss = self.agent.update(astate, ku, axis_name=axis_name)
            return (astate, k), loss

        (astate, _), losses = jax.lax.scan(
            update, (astate, key), None, length=n_updates
        )
        return astate, mstate, stats, losses.mean()

    def eval_chunk(self, astate, mstate, key, n_steps, min_episodes=None):
        from .common import eval_chunk

        return eval_chunk(
            self.vec, self.agent.act, astate, mstate, key, n_steps,
            min_episodes=min_episodes,
            state_view=lambda st: TableState(idx=st.idx, t=st.t),
            accumulate=_accumulate,
        )
