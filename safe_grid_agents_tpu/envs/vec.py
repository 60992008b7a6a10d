"""Vectorized environment runtime: vmap + auto-reset + episode accounting.

This is the workhorse the reference never had (SURVEY.md §2d: the reference
steps ONE pycolab env at a time in Python). Here N instances advance in
lockstep inside ``jit``:

* one pure per-instance step is ``vmap``-ed over [N] states/actions/keys;
* auto-reset happens *inside* the step (done → fresh state via
  ``env.carry_reset``), so a scan over time never leaves the device;
* per-instance RNG: each instance owns a key; every step splits it into
  (step key, reset key, next key). The oracle consumes the identical stream,
  which is what makes bitwise parity tests possible (SURVEY.md §7).

Episode returns (observed and hidden) are accumulated on-device and emitted
on the reset boundary via the ``finished_*`` fields (valid where ``done``).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .base import Env


def tree_where(pred, on_true, on_false):
    """Elementwise select over matching pytrees; ``pred`` broadcasts."""
    return jax.tree.map(
        lambda a, b: jnp.where(jnp.expand_dims(pred, tuple(range(pred.ndim, a.ndim))), a, b),
        on_true,
        on_false,
    )


@struct.dataclass
class VecState:
    env: Any              # stacked per-instance env states, leaves [N, ...]
    key: jnp.ndarray      # [N, 2] u32 per-instance RNG keys
    ep_return: jnp.ndarray  # [N] f32 running observed return
    ep_hidden: jnp.ndarray  # [N] f32 running hidden performance
    ep_len: jnp.ndarray     # [N] i32 running episode length


@struct.dataclass
class VecStepOut:
    reward: jnp.ndarray          # [N] f32
    hidden_reward: jnp.ndarray   # [N] f32
    done: jnp.ndarray            # [N] bool
    info: Any                    # dict of [N] leaves
    # Episode stats, valid only where done is True:
    finished_return: jnp.ndarray  # [N] f32
    finished_hidden: jnp.ndarray  # [N] f32
    finished_len: jnp.ndarray     # [N] i32
    # Env state *before* auto-reset (the terminal successor state) — needed
    # by replay-based learners for correct bootstrapping.
    pre_reset_env: Any


class VecEnv:
    """N lockstep instances of ``env``. All methods are pure and jittable."""

    def __init__(self, env: Env, n_envs: int):
        self.env = env
        self.n_envs = n_envs
        self._v_reset = jax.vmap(env.reset)
        self._v_observe = jax.vmap(env.observe)
        self._v_board = jax.vmap(env.board)
        self._v_step1 = jax.vmap(self._step1)
        if env.num_states is not None:
            self._v_index = jax.vmap(env.state_index)

    # -- single-instance step with auto-reset ------------------------------
    def _step1(self, env_state, action, key):
        k_step, k_reset, k_next = jax.random.split(key, 3)
        out = self.env.step(env_state, action, k_step)
        reset_state = self.env.carry_reset(out.state, k_reset)
        next_state = tree_where(out.done, reset_state, out.state)
        return next_state, out, k_next

    # -- public API --------------------------------------------------------
    def reset(self, key) -> VecState:
        keys = jax.random.split(key, self.n_envs)
        init_keys = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        env_states = self._v_reset(init_keys[:, 0])
        n = self.n_envs
        return VecState(
            env=env_states,
            key=init_keys[:, 1],
            ep_return=jnp.zeros((n,), jnp.float32),
            ep_hidden=jnp.zeros((n,), jnp.float32),
            ep_len=jnp.zeros((n,), jnp.int32),
        )

    def step(self, vstate: VecState, actions) -> Tuple[VecState, VecStepOut]:
        next_env, out, next_keys = self._v_step1(vstate.env, actions, vstate.key)
        ep_return = vstate.ep_return + out.reward
        ep_hidden = vstate.ep_hidden + out.hidden_reward
        ep_len = vstate.ep_len + 1
        zero_f = jnp.zeros_like(ep_return)
        new_vstate = VecState(
            env=next_env,
            key=next_keys,
            ep_return=jnp.where(out.done, zero_f, ep_return),
            ep_hidden=jnp.where(out.done, zero_f, ep_hidden),
            ep_len=jnp.where(out.done, jnp.zeros_like(ep_len), ep_len),
        )
        vout = VecStepOut(
            reward=out.reward,
            hidden_reward=out.hidden_reward,
            done=out.done,
            info=out.info,
            finished_return=ep_return,
            finished_hidden=ep_hidden,
            finished_len=ep_len,
            pre_reset_env=out.state,
        )
        return new_vstate, vout

    def observe(self, vstate: VecState) -> jnp.ndarray:
        """[N, P, H, W] observation planes for the current states."""
        return self._v_observe(vstate.env)

    def board(self, vstate: VecState) -> jnp.ndarray:
        return self._v_board(vstate.env)

    def state_index(self, vstate: VecState) -> jnp.ndarray:
        return self._v_index(vstate.env)

    # -- bulk stepping (bench / random warmup) -----------------------------
    def run_actions(self, vstate: VecState, actions_tn) -> Tuple[VecState, VecStepOut]:
        """Scan a [T, N] action matrix through the env; returns stacked outs."""

        def body(vs, acts):
            vs, out = self.step(vs, acts)
            return vs, out

        return jax.lax.scan(body, vstate, actions_tn)

    def run_random(self, vstate: VecState, key, n_steps: int) -> Tuple[VecState, VecStepOut]:
        """Scan ``n_steps`` uniform-random actions (bench harness / warmup).

        Action keys are drawn from a dedicated stream (not the per-instance
        env keys), mirroring the reference's random warmup (SURVEY.md §2a #5).
        """

        def body(carry, _):
            vs, k = carry
            k, ka = jax.random.split(k)
            acts = jax.random.randint(ka, (self.n_envs,), 0, self.env.n_actions)
            vs, out = self.step(vs, acts)
            return (vs, k), out

        (vstate, _), outs = jax.lax.scan(body, (vstate, key), None, length=n_steps)
        return vstate, outs

    def run_random_reduced(
        self, vstate: VecState, key, n_steps: int
    ) -> Tuple[VecState, dict]:
        """``run_random`` with on-the-fly reduction: accumulates the chunk's
        totals (reward, episodes, finished return) in the scan carry instead
        of stacking [T, N] outputs. XLA cannot fuse a reduction across a
        scan, so the stacked form writes+reads ~(T·N) floats of HBM per
        chunk that a benchmark immediately collapses — at the headline
        config (4096×4096) the carry form removes that traffic entirely.
        Full per-step outputs remain available via ``run_random``."""

        def body(carry, _):
            vs, k, acc = carry
            k, ka = jax.random.split(k)
            acts = jax.random.randint(ka, (self.n_envs,), 0, self.env.n_actions)
            vs, out = self.step(vs, acts)
            acc = {
                "reward_sum": acc["reward_sum"] + out.reward.sum(),
                "episodes": acc["episodes"] + out.done.sum(),
                "finished_return_sum": acc["finished_return_sum"]
                + jnp.where(out.done, out.finished_return, 0.0).sum(),
            }
            return (vs, k, acc), None

        acc0 = {
            "reward_sum": jnp.float32(0.0),
            "episodes": jnp.int32(0),
            "finished_return_sum": jnp.float32(0.0),
        }
        (vstate, _, acc), _ = jax.lax.scan(
            body, (vstate, key, acc0), None, length=n_steps
        )
        return vstate, acc
