"""Fused PPO trainer (reference learn.py::ppo_learn, SURVEY.md §3.2).

One jitted chunk = collect [T, N] rollout (scan over the vectorized env) →
GAE(λ) (reverse scan) → ``epochs`` passes of ``n_minibatches`` shuffled
minibatch updates (nested scans). Nothing leaves the device mid-chunk.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..agents.ppo import PPOAgent, PPOState
from ..envs.vec import VecEnv, VecState
from .common import ChunkStats, eval_chunk, reward_source


def _whiten(x, axis_name: str | None = None):
    """Normalize to zero mean / unit std, over the global batch if inside a
    named data axis."""
    m = x.mean()
    m2 = jnp.square(x).mean()
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
        m2 = jax.lax.pmean(m2, axis_name)
    var = jnp.maximum(m2 - jnp.square(m), 0.0)
    return (x - m) / (jnp.sqrt(var) + 1e-8)


def compute_gae(rewards, values, dones, last_value, discount, lam):
    """[T, N] inputs → (advantages, returns), masking across resets."""

    def body(carry, xs):
        gae, next_value = carry
        r, v, d = xs
        nonterm = 1.0 - d.astype(jnp.float32)
        delta = r + discount * nonterm * next_value - v
        gae = delta + discount * lam * nonterm * gae
        return (gae, v), gae

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    return advantages, advantages + values


class PPOTrainer:
    def __init__(self, agent: PPOAgent, vec: VecEnv, cheat: bool = False):
        self.agent = agent
        self.vec = vec
        self.cheat = cheat

    def init(self, key) -> Tuple[PPOState, VecState]:
        ka, kv = jax.random.split(key)
        return self.agent.init(ka), self.vec.reset(kv)

    # -- rollout collection ------------------------------------------------
    def collect(self, astate: PPOState, vstate: VecState, key, n_steps: int):
        agent = self.agent

        def body(carry, _):
            vs, k, stats = carry
            k, ka = jax.random.split(k)
            action, logp, value = agent.sample_action(astate.params, vs.env, ka)
            pre_env = vs.env
            vs, out = self.vec.step(vs, action)
            step_data = {
                "states": pre_env,
                "actions": action,
                "old_logp": logp,
                "values": value,
                "rewards": reward_source(out, self.cheat),
                "observed": out.reward,
                "hidden": out.hidden_reward,
                "dones": out.done,
            }
            return (vs, k, stats.accumulate(out)), step_data

        (vstate, key, stats), traj = jax.lax.scan(
            body, (vstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return vstate, key, stats, traj

    # -- optimization ------------------------------------------------------
    def optimize(
        self, astate: PPOState, flat: dict, key, batch_size: int,
        axis_name: str | None = None, entropy_coef=None,
    ):
        """Multi-epoch shuffled minibatch updates over flat [B] data.

        Under ``shard_map`` over a data axis, ``batch_size`` is the per-shard
        size: each device shuffles and minibatches its own rollout shard and
        gradients are ``pmean``-ed over ICI every minibatch — equivalent to a
        globally-sharded minibatch without any cross-device data motion
        (SURVEY.md §2d "rollout aggregation" done the cheap way)."""
        agent = self.agent
        n_mb = agent.n_minibatches
        mb_size = batch_size // n_mb

        def epoch(carry, _):
            params, opt_state, k = carry
            k, kp = jax.random.split(k)
            perm = jax.random.permutation(kp, batch_size)

            def minibatch(carry, mb_idx):
                params, opt_state = carry
                take = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb_size, mb_size)
                mb = jax.tree.map(lambda x: x[take], flat)
                loss, grads = jax.value_and_grad(agent.loss)(
                    params, mb, entropy_coef
                )
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                    loss = jax.lax.pmean(loss, axis_name)
                updates, opt_state = agent.tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(n_mb)
            )
            return (params, opt_state, k), losses.mean()

        (params, opt_state, _), losses = jax.lax.scan(
            epoch, (astate.params, astate.opt_state, key), None, length=agent.epochs
        )
        return params, opt_state, losses.mean()

    # -- full chunk --------------------------------------------------------
    def train_chunk(
        self,
        astate: PPOState,
        vstate: VecState,
        key,
        n_steps: int,
        axis_name: str | None = None,
    ) -> Tuple[PPOState, VecState, ChunkStats, jnp.ndarray]:
        agent = self.agent
        vstate, key, stats, traj = self.collect(astate, vstate, key, n_steps)

        _, last_value = agent.policy_value(astate.params, vstate.env)
        advantages, returns = compute_gae(
            traj["rewards"],
            traj["values"],
            traj["dones"],
            last_value,
            agent.discount,
            agent.gae_lambda,
        )
        # Whiten advantages over the whole (global) chunk (reference
        # ppo_learn [M]); under a data axis the moments are psum-ed so every
        # shard normalizes identically.
        advantages = _whiten(advantages, axis_name)

        # Per-shard batch: under shard_map the local env count is N/D.
        batch_size = n_steps * traj["actions"].shape[1]
        flat = {
            "states": jax.tree.map(
                lambda x: x.reshape((batch_size,) + x.shape[2:]), traj["states"]
            ),
            "actions": traj["actions"].reshape(batch_size),
            "old_logp": traj["old_logp"].reshape(batch_size),
            "advantages": advantages.reshape(batch_size),
            "returns": returns.reshape(batch_size),
        }
        key, ko = jax.random.split(key)
        params, opt_state, loss = self.optimize(
            astate, flat, ko, batch_size, axis_name=axis_name,
            entropy_coef=agent.entropy_coef(astate.step),
        )
        astate = PPOState(
            params=params,
            opt_state=opt_state,
            step=astate.step + batch_size,
        )
        return astate, vstate, stats, loss

    def eval_chunk(self, astate, vstate, key, n_steps, min_episodes=None):
        return eval_chunk(
            self.vec, self.agent.act, astate, vstate, key, n_steps,
            min_episodes=min_episodes,
        )
