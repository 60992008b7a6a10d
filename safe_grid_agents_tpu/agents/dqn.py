"""Deep Q-learning agent (reference deep.py, SURVEY.md §2a #9).

Reference algorithm [H]: MLP over the board observation, ε-greedy with
linear anneal, uniform replay buffer, target network hard-synced every
``--sync-every`` updates, Huber (SmoothL1) TD loss, Adam. Flags mirrored:
``--lr --discount --epsilon --batch-size --replay-capacity --sync-every``.

TPU-first differences: the replay buffer lives on device as fixed-shape
arrays storing *compact env states* (observations re-rendered at sample
time), N transitions are pushed per vectorized step, and rollout + sampling
+ update fuse into one jitted chunk (SURVEY.md §7 step 5).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..types import Experience as Transition  # replay record (types.py)
from ..utils import replay
from .base import Agent
from .networks import QMLP


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    buffer: replay.BufferState
    step: jnp.ndarray     # i32 — env steps seen (drives ε anneal)
    updates: jnp.ndarray  # i32 — gradient updates done (drives target sync)


class DQNAgent(Agent):
    name = "deep-q"

    def __init__(
        self,
        env,
        lr: float = 1e-3,
        discount: float = 0.99,
        epsilon: float = 1.0,
        epsilon_final: float = 0.05,
        epsilon_anneal_steps: int = 300_000,
        batch_size: int = 256,
        replay_capacity: int = 100_000,
        sync_every: int = 200,
        hidden: tuple = (128, 128),
        table: bool = False,
        double_q: bool = False,
        prioritized: bool = False,
        per_alpha: float = 0.6,
        per_beta: float = 0.4,
        per_clip: float = 1.0,
        per_eps: float = 0.05,
        n_step: int = 1,
    ):
        super().__init__(env)
        assert n_step >= 1
        self.n_step = n_step
        self.double_q = double_q
        self.prioritized = prioritized
        self.per_alpha = per_alpha
        self.per_beta = per_beta
        self.per_clip = per_clip
        self.per_eps = per_eps
        self.discount = discount
        self.epsilon = epsilon
        self.epsilon_final = epsilon_final
        self.epsilon_anneal_steps = epsilon_anneal_steps
        self.batch_size = batch_size
        self.replay_capacity = replay_capacity
        self.sync_every = sync_every
        self.lr = lr
        self.hidden = tuple(hidden)
        self._table_net = table
        if table:
            # Table-folded fast path (compiled envs): obs table folded into
            # the first dense layer; forward consumes state indices.
            from ..envs.compiled import CompiledEnv
            from .networks import make_table_q

            assert isinstance(env, CompiledEnv), "table=True needs a compiled env"
            s = env.obs_table.shape[0]
            self.net = make_table_q(
                env.obs_table.reshape(s, -1), env.n_actions, hidden
            )
        else:
            self.net = QMLP(n_actions=env.n_actions, hidden=hidden)
        self.tx = optax.adam(lr)
        self._v_observe = jax.vmap(env.observe)

    def init_params(self, key):
        """Network params only — no replay ring. Trainers that just need the
        param pytree STRUCTURE (e.g. MXUDQNTrainer's ravel_pytree closure)
        use this to avoid a throwaway multi-hundred-MB buffer allocation."""
        if self._table_net:
            return self.net.init(key, jnp.zeros((1,), jnp.int32))
        obs = self.env.observe(self.env.reset(key))
        return self.net.init(key, obs[None])

    def init(self, key) -> DQNState:
        params = self.init_params(key)
        example = Transition(
            state=self.env.reset(key),
            action=jnp.int32(0),
            reward=jnp.float32(0.0),
            next_state=self.env.reset(key),
            done=jnp.bool_(False),
        )
        buf = (
            replay.init_prioritized(self.replay_capacity, example)
            if self.prioritized
            else replay.init(self.replay_capacity, example)
        )
        return DQNState(
            params=params,
            target_params=params,
            opt_state=self.tx.init(params),
            buffer=buf,
            step=jnp.int32(0),
            updates=jnp.int32(0),
        )

    def push(self, buffer, batch: Transition):
        """Append a batch of transitions to whichever ring this agent uses."""
        if self.prioritized:
            return replay.push_batch_prioritized(
                buffer, batch, eps=self.per_eps, clip=self.per_clip
            )
        return replay.push_batch(buffer, batch)

    def current_beta(self, step) -> jnp.ndarray:
        """PER importance-correction exponent, annealed β₀ → 1 over the same
        horizon as ε (Schaul et al.: full correction by convergence)."""
        frac = jnp.clip(step / self.epsilon_anneal_steps, 0.0, 1.0)
        return self.per_beta + frac * (1.0 - self.per_beta)

    def current_epsilon(self, step) -> jnp.ndarray:
        frac = jnp.clip(step / self.epsilon_anneal_steps, 0.0, 1.0)
        return self.epsilon + frac * (self.epsilon_final - self.epsilon)

    def q_values(self, params, env_states) -> jnp.ndarray:
        if self._table_net:
            return self.net.apply(params, env_states.idx)
        return self.net.apply(params, self._v_observe(env_states))

    def for_env(self, env):
        c = super().for_env(env)
        if self._table_net:
            # Rebind the fold table to the eval env's layout (same shapes) —
            # otherwise --eval-env would gather TRAIN-layout observations.
            from .networks import make_table_q

            s = env.obs_table.shape[0]
            c.net = make_table_q(env.obs_table.reshape(s, -1), env.n_actions)
        return c

    def act(self, astate: DQNState, env_states, key):
        del key
        return jnp.argmax(self.q_values(astate.params, env_states), -1).astype(
            jnp.int32
        )

    def act_explore(self, astate: DQNState, env_states, key):
        greedy = self.act(astate, env_states, key)
        n = greedy.shape[0]
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, (n,), 0, self.env.n_actions)
        explore = jax.random.bernoulli(k2, self.current_epsilon(astate.step), (n,))
        return jnp.where(explore, rand, greedy)

    def td_components(self, params, target_params, batch: Transition):
        """Per-sample (huber losses, TD errors) for a sampled batch."""
        if self._table_net:
            nxt = batch.next_state.idx
            q = self.net.apply(params, batch.state.idx)
            q_next = self.net.apply(target_params, nxt)
        else:
            nxt = self._v_observe(batch.next_state)
            q = self.net.apply(params, self._v_observe(batch.state))
            q_next = self.net.apply(target_params, nxt)
        q_sa = jnp.take_along_axis(q, batch.action[:, None], axis=-1).squeeze(-1)
        if self.double_q:
            # Double DQN (van Hasselt et al. 2015): the ONLINE net picks the
            # bootstrap action, the target net evaluates it — decoupling
            # selection from evaluation to curb max-operator overestimation.
            a_star = jnp.argmax(
                jax.lax.stop_gradient(self.net.apply(params, nxt)), -1
            )
            boot = jnp.take_along_axis(q_next, a_star[:, None], -1).squeeze(-1)
        else:
            boot = q_next.max(-1)
        # n-step: batch.reward is the truncated window return Rₜ⁽ⁿ⁾ and the
        # bootstrap sits n steps out, so it pays γⁿ (training/dqn.py).
        gamma_n = self.discount ** self.n_step
        target = jax.lax.stop_gradient(
            batch.reward + gamma_n * jnp.where(batch.done, 0.0, boot)
        )
        return optax.huber_loss(q_sa, target), q_sa - target

    def td_loss(self, params, target_params, batch: Transition) -> jnp.ndarray:
        losses, _ = self.td_components(params, target_params, batch)
        return losses.mean()

    def update(self, astate: DQNState, key, axis_name: str | None = None) -> tuple:
        """One sampled gradient step + scheduled target sync. Under
        ``shard_map`` each device samples its own shard's buffer; ``psum``-
        averaged gradients keep the replicated params in lockstep
        (SURVEY.md §2d)."""
        buffer = astate.buffer
        if self.prioritized:
            batch, idxs, weights = replay.sample_prioritized(
                buffer, key, self.batch_size, self.per_alpha,
                self.current_beta(astate.step),
            )

            def loss_fn(params):
                losses, td = self.td_components(
                    params, astate.target_params, batch
                )
                return (weights * losses).mean(), td

            (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                astate.params
            )
            # Pre-update |δ| (clipped) becomes the sampled slots' priority.
            buffer = replay.update_priorities(
                buffer, idxs, td, eps=self.per_eps, clip=self.per_clip
            )
        else:
            batch = replay.sample(buffer, key, self.batch_size)
            loss, grads = jax.value_and_grad(self.td_loss)(
                astate.params, astate.target_params, batch
            )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = self.tx.update(grads, astate.opt_state, astate.params)
        params = optax.apply_updates(astate.params, updates)
        n_updates = astate.updates + 1
        sync = (n_updates % self.sync_every) == 0
        target_params = jax.tree.map(
            lambda t, p: jnp.where(sync, p, t), astate.target_params, params
        )
        return (
            DQNState(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                buffer=buffer,
                step=astate.step,
                updates=n_updates,
            ),
            loss,
        )
