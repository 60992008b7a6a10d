"""Tabular Q-learning agent.

Reference algorithm (SURVEY.md §2a #8, confidence H): ε-greedy with linear
anneal; update ``Q[s,a] += lr · (r + γ·max_a' Q[s',a'] − Q[s,a])``; flags
``--lr --discount --epsilon``. The reference keyed a defaultdict by hashed
board bytes; here the state space is enumerable, so Q is a dense
``[num_states, n_actions]`` array indexed by each env's perfect hash
(``Env.state_index``) — no hashing, no host round-trips, fully vectorizable.

Batched update note: with N parallel envs the N TD updates are applied with
``.at[].add`` scatter-accumulation; duplicate (s, a) pairs within one batch
each contribute a TD error computed against the *pre-update* Q (documented
deviation from strictly-sequential single-env Q-learning; N=1 recovers the
reference exactly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import Agent


@struct.dataclass
class TabularQState:
    q: jnp.ndarray     # [S, A] f32
    step: jnp.ndarray  # i32 — global env-steps seen (drives ε anneal)


class TabularQAgent(Agent):
    name = "tabular-q"

    def __init__(
        self,
        env,
        lr: float = 0.1,
        discount: float = 0.99,
        epsilon: float = 1.0,
        epsilon_final: float = 0.01,
        epsilon_anneal_steps: int = 200_000,
    ):
        super().__init__(env)
        assert env.num_states is not None, f"{env.name}: no tabular state index"
        self.lr = lr
        self.discount = discount
        self.epsilon = epsilon
        self.epsilon_final = epsilon_final
        self.epsilon_anneal_steps = epsilon_anneal_steps
        self._v_index = jax.vmap(env.state_index)

    def init(self, key):
        del key
        return TabularQState(
            q=jnp.zeros((self.env.num_states, self.env.n_actions), jnp.float32),
            step=jnp.int32(0),
        )

    def current_epsilon(self, step) -> jnp.ndarray:
        frac = jnp.clip(step / self.epsilon_anneal_steps, 0.0, 1.0)
        return self.epsilon + frac * (self.epsilon_final - self.epsilon)

    def act_idx(self, astate: TabularQState, idx, key):
        """Greedy actions from raw state indices (engine-agnostic: VecEnv
        states go through ``state_index``; the MXU engine carries indices
        natively)."""
        del key
        return jnp.argmax(astate.q[idx], axis=-1).astype(jnp.int32)

    def act_explore_idx(self, astate: TabularQState, idx, key):
        n = idx.shape[0]
        k1, k2 = jax.random.split(key)
        greedy = jnp.argmax(astate.q[idx], axis=-1).astype(jnp.int32)
        rand = jax.random.randint(k1, (n,), 0, self.env.n_actions)
        explore = jax.random.bernoulli(k2, self.current_epsilon(astate.step), (n,))
        return jnp.where(explore, rand, greedy)

    def act(self, astate: TabularQState, env_states, key):
        return self.act_idx(astate, self._v_index(env_states), key)

    def act_explore(self, astate: TabularQState, env_states, key):
        return self.act_explore_idx(astate, self._v_index(env_states), key)

    def learn(
        self,
        astate: TabularQState,
        s_idx: jnp.ndarray,   # [N] i32 — pre-step state indices
        actions: jnp.ndarray,  # [N] i32
        rewards: jnp.ndarray,  # [N] f32
        next_idx: jnp.ndarray,  # [N] i32 — post-step (pre-reset) indices
        dones: jnp.ndarray,    # [N] bool
        axis_name: str | None = None,
    ) -> TabularQState:
        """Batched TD update with duplicate averaging.

        With N parallel envs, many transitions in one batch can share the
        same (s, a) — at N ≫ |S| this is the common case (all envs start in
        the start state). Summing their TD deltas multiplies the effective
        learning rate by the duplicate count and diverges; instead the
        scatter accumulates TD errors AND counts, and applies the *mean* TD
        per (s, a): ``Q[s,a] += lr · mean(td)``. N=1 recovers the reference's
        sequential update exactly.

        Under ``shard_map`` over a data axis, pass ``axis_name`` so the
        per-shard sums/counts are psum-ed before the division and every
        device applies the identical update to its replicated table
        (SURVEY.md §2d data parallelism)."""
        q = astate.q
        target = rewards + self.discount * jnp.where(
            dones, 0.0, jnp.max(q[next_idx], axis=-1)
        )
        td = target - q[s_idx, actions]
        td_sum = jnp.zeros_like(q).at[s_idx, actions].add(td)
        cnt = jnp.zeros_like(q).at[s_idx, actions].add(1.0)
        n = jnp.int32(s_idx.shape[0])
        if axis_name is not None:
            td_sum = jax.lax.psum(td_sum, axis_name)
            cnt = jax.lax.psum(cnt, axis_name)
            n = jax.lax.psum(n, axis_name)
        delta = self.lr * td_sum / jnp.maximum(cnt, 1.0)
        return TabularQState(q=q + delta, step=astate.step + n)
