"""Fused DQN trainer (reference learn.py::dqn_learn + warmup.py::dqn_warmup,
SURVEY.md §2a #3/#5): each chunk scans T vectorized env steps — act-explore,
step, push N transitions — then performs U sampled gradient updates, all in
one jitted program. Warmup fills the replay buffer with random-policy
transitions before learning, exactly like the reference."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..agents.dqn import DQNAgent, DQNState, Transition
from ..envs.vec import VecEnv, VecState
from .common import ChunkStats, eval_chunk, reward_source


class DQNTrainer:
    def __init__(
        self,
        agent: DQNAgent,
        vec: VecEnv,
        cheat: bool = False,
        updates_per_chunk: int | None = None,
    ):
        self.agent = agent
        self.vec = vec
        self.cheat = cheat
        self.updates_per_chunk = updates_per_chunk

    def init(self, key) -> Tuple[DQNState, VecState]:
        ka, kv = jax.random.split(key)
        return self.agent.init(ka), self.vec.reset(kv)

    def _push(self, astate: DQNState, pre_env, actions, rewards, out) -> DQNState:
        batch = Transition(
            state=pre_env,
            action=actions,
            reward=rewards,
            next_state=out.pre_reset_env,
            done=out.done,
        )
        return astate.replace(
            buffer=self.agent.push(astate.buffer, batch),
            step=astate.step + actions.shape[0],
        )

    def warmup_chunk(
        self, astate: DQNState, vstate: VecState, key, n_steps: int
    ) -> Tuple[DQNState, VecState, ChunkStats]:
        """Random-policy buffer fill (reference dqn_warmup)."""

        def body(carry, _):
            astate, vs, k, stats = carry
            k, ka = jax.random.split(k)
            # Local env count (N/D under shard_map), not the global n_envs.
            n_local = jax.tree.leaves(vs.env)[0].shape[0]
            actions = jax.random.randint(
                ka, (n_local,), 0, self.vec.env.n_actions
            )
            pre_env = vs.env
            vs, out = self.vec.step(vs, actions)
            astate = self._push(
                astate, pre_env, actions, reward_source(out, self.cheat), out
            )
            return (astate, vs, k, stats.accumulate(out)), None

        (astate, vstate, _, stats), _ = jax.lax.scan(
            body, (astate, vstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return astate, vstate, stats

    def train_chunk(
        self,
        astate: DQNState,
        vstate: VecState,
        key,
        n_steps: int,
        axis_name: str | None = None,
    ) -> Tuple[DQNState, VecState, ChunkStats, jnp.ndarray]:
        """T env steps (collect) then U gradient updates (learn)."""
        agent = self.agent

        def collect(carry, _):
            astate, vs, k, stats = carry
            k, ka = jax.random.split(k)
            actions = agent.act_explore(astate, vs.env, ka)
            pre_env = vs.env
            vs, out = self.vec.step(vs, actions)
            astate = self._push(
                astate, pre_env, actions, reward_source(out, self.cheat), out
            )
            return (astate, vs, k, stats.accumulate(out)), None

        (astate, vstate, key, stats), _ = jax.lax.scan(
            collect, (astate, vstate, key, ChunkStats.zero()), None, length=n_steps
        )

        n_updates = self.updates_per_chunk or n_steps

        def update(carry, _):
            astate, k = carry
            k, ku = jax.random.split(k)
            astate, loss = agent.update(astate, ku, axis_name=axis_name)
            return (astate, k), loss

        (astate, _), losses = jax.lax.scan(
            update, (astate, key), None, length=n_updates
        )
        return astate, vstate, stats, losses.mean()

    def eval_chunk(self, astate, vstate, key, n_steps):
        return eval_chunk(self.vec, self.agent.act, astate, vstate, key, n_steps)
