"""Fused DQN trainer (reference learn.py::dqn_learn + warmup.py::dqn_warmup,
SURVEY.md §2a #3/#5): each chunk scans T vectorized env steps — act-explore,
step — pushes the chunk's transitions into replay, then performs U sampled
gradient updates, all in one jitted program. Warmup fills the replay buffer
with random-policy transitions before learning, exactly like the reference.

n-step returns (``DQNAgent(n_step=n)``): the chunk trajectory is post-
processed like PPO's GAE pass — window sums Rₜ⁽ⁿ⁾ = Σⱼ γʲ rₜ₊ⱼ truncated at
the first done, bootstrapping from sₜ₊ₙ with γⁿ — and the resulting windows
are pushed instead of 1-step transitions. The last n−1 steps of each chunk
have no full window and are dropped ((n−1)/T of the data; unbiased). With
n_step=1 the pushed stream is bitwise-identical to the per-step push.

HBM note: n_step > 1 stacks TWO full [T, N] env-state pytrees per chunk
(states + pre-reset successors) instead of streaming per-step pushes — the
price of lookahead. At the documented presets (≤256 envs × 64 steps, ~10
small int registers per state) that is ≤ a few MB; if you raise --n-envs ×
--chunk-steps into the 10⁵+ region with --n-step > 1, budget roughly
2·T·N·sizeof(state) of extra collect-phase HBM."""
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

    def _collect(
        self, astate: DQNState, vstate: VecState, key, n_steps: int,
        random_policy: bool,
    ):
        """Scan T env steps; n_step == 1 streams per-step pushes into the
        ring (no trajectory buffer), n_step > 1 stacks the chunk and pushes
        its windows once (the stacking is the price of lookahead)."""
        agent = self.agent
        streaming = agent.n_step == 1

        def body(carry, _):
            astate, vs, k, stats = carry
            k, ka = jax.random.split(k)
            n_local = jax.tree.leaves(vs.env)[0].shape[0]
            if random_policy:
                actions = jax.random.randint(
                    ka, (n_local,), 0, self.vec.env.n_actions
                )
            else:
                actions = agent.act_explore(astate, vs.env, ka)
            pre_env = vs.env
            vs, out = self.vec.step(vs, actions)
            astate = astate.replace(step=astate.step + n_local)
            data = (
                pre_env,
                actions,
                reward_source(out, self.cheat),
                out.pre_reset_env,
                out.done,
            )
            if streaming:
                astate = astate.replace(
                    buffer=agent.push(astate.buffer, Transition(*data))
                )
                data = None
            return (astate, vs, k, stats.accumulate(out)), data

        (astate, vstate, key, stats), traj = jax.lax.scan(
            body, (astate, vstate, key, ChunkStats.zero()), None, length=n_steps
        )
        if not streaming:
            astate = astate.replace(buffer=self._push_traj(astate.buffer, traj))
        return astate, vstate, key, stats

    def _push_traj(self, buffer, traj):
        return push_traj_windows(self.agent, buffer, traj)

    def warmup_chunk(
        self, astate: DQNState, vstate: VecState, key, n_steps: int
    ) -> Tuple[DQNState, VecState, ChunkStats]:
        """Random-policy buffer fill (reference dqn_warmup)."""
        astate, vstate, _, stats = self._collect(
            astate, vstate, key, n_steps, random_policy=True
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
        astate, vstate, key, stats = self._collect(
            astate, vstate, key, n_steps, random_policy=False
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
        return astate, vstate, stats, losses.mean()

    def eval_chunk(self, astate, vstate, key, n_steps, min_episodes=None):
        return eval_chunk(
            self.vec, self.agent.act, astate, vstate, key, n_steps,
            min_episodes=min_episodes,
        )


def _flat(x, t_out):
    """[T, N, ...] → [t_out*N, ...] taking the first t_out steps, time-major
    (matches the per-step push order exactly when n_step == 1)."""
    x = x[:t_out]
    return x.reshape((-1,) + x.shape[2:])


def push_traj_windows(agent, buffer, traj):
    """Push a chunk trajectory as n-step windows (module docstring).

    ``traj`` = (states, actions, rewards, next_states, dones), leaves
    [T, N, ...]. Shared by ``DQNTrainer`` and ``MXUDQNTrainer``; with
    n_step == 1 the pushed stream is bitwise-identical to per-step pushes
    (ret = 1.0·rewards exactly; same time-major slot order)."""
    states, actions, rewards, next_states, dones = traj
    n = agent.n_step
    t_total = actions.shape[0]
    assert n <= t_total, f"n_step={n} exceeds chunk length {t_total}"
    t_out = t_total - n + 1
    # Window sums, truncated at the first done (auto-reset means rewards
    # past a done belong to the NEXT episode and must not leak in).
    ret = jnp.zeros_like(rewards[:t_out])
    alive = jnp.ones_like(rewards[:t_out])
    for j in range(n):  # static tiny n — unrolled
        ret = ret + (agent.discount ** j) * alive * rewards[j : j + t_out]
        alive = alive * (1.0 - dones[j : j + t_out].astype(ret.dtype))
    batch = Transition(
        state=jax.tree.map(lambda x: _flat(x, t_out), states),
        action=_flat(actions, t_out),
        reward=_flat(ret, t_out),
        # sₜ₊ₙ = the n-1'th step's successor; when a done cut the window
        # the bootstrap is masked by done anyway.
        next_state=jax.tree.map(
            lambda x: _flat(x[n - 1 :], t_out), next_states
        ),
        done=_flat(alive == 0.0, t_out),
    )
    return agent.push(buffer, batch)
