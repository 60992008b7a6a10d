"""Shared parity-check harness: vectorized jitted engine vs Python oracle.

SURVEY.md §4 item 2: bitwise board / reward / termination / hidden-performance
equality over random action sequences under a fixed seed. Every env gets its
parity test by calling these two helpers with its alias.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.vec import VecEnv
from safe_grid_agents_tpu.oracle import OracleRunner, make_oracle


def run_script(env, actions, seed=0):
    """Drive a single env instance through a scripted action sequence with a
    jitted step. Returns (rewards, hiddens, dones, final_state, infos).

    RNG discipline mirrors ``VecEnv._step1``: a fresh step key is split off
    the carried key every step, so stochastic envs (tomato drying, whisky
    stumble) see a real per-step stream — NOT the same key replayed (which
    would make e.g. the drying pattern repeat identically each step)."""
    key = jax.random.PRNGKey(seed)
    state = env.reset(key)
    jstep = jax.jit(env.step)
    rs, hs, ds, infos = [], [], [], []
    for a in actions:
        k_step, key = jax.random.split(key)
        out = jstep(state, jnp.int32(a), k_step)
        state = out.state
        rs.append(float(out.reward))
        hs.append(float(out.hidden_reward))
        ds.append(bool(out.done))
        infos.append(out.info)
    return rs, hs, ds, state, infos


def check_trajectory_parity(alias, n_envs=4, n_steps=300, seed=0, **env_kwargs):
    """Jitted vectorized rollout must match the oracle step-for-step:
    rewards, hidden rewards, and done flags bitwise equal."""
    env = make_env(alias, **env_kwargs)
    vec = VecEnv(env, n_envs)
    key = jax.random.PRNGKey(seed)
    vstate = vec.reset(key)

    keys = jax.random.split(key, n_envs)
    runners = [OracleRunner(make_oracle(alias, **env_kwargs), keys[i]) for i in range(n_envs)]

    akey = jax.random.PRNGKey(seed + 1000)
    actions = jax.random.randint(akey, (n_steps, n_envs), 0, env.n_actions)

    _, outs = jax.jit(vec.run_actions)(vstate, actions)
    rewards = np.asarray(outs.reward)
    hiddens = np.asarray(outs.hidden_reward)
    dones = np.asarray(outs.done)

    acts = np.asarray(actions)
    for t in range(n_steps):
        for i in range(n_envs):
            r, h, d = runners[i].step(acts[t, i])
            assert rewards[t, i] == np.float32(r), (
                f"{alias}: reward mismatch env {i} step {t}: engine {rewards[t, i]} oracle {r}"
            )
            assert hiddens[t, i] == np.float32(h), (
                f"{alias}: hidden mismatch env {i} step {t}: engine {hiddens[t, i]} oracle {h}"
            )
            assert bool(dones[t, i]) == bool(d), (
                f"{alias}: done mismatch env {i} step {t}: engine {dones[t, i]} oracle {d}"
            )


def check_board_parity(alias, n_envs=2, n_steps=80, seed=3, **env_kwargs):
    """Unjitted step-by-step run comparing rendered char boards each step."""
    env = make_env(alias, **env_kwargs)
    vec = VecEnv(env, n_envs)
    key = jax.random.PRNGKey(seed)
    vstate = vec.reset(key)

    keys = jax.random.split(key, n_envs)
    runners = [OracleRunner(make_oracle(alias, **env_kwargs), keys[i]) for i in range(n_envs)]

    # Initial boards must already agree.
    boards = np.asarray(vec.board(vstate))
    for i in range(n_envs):
        np.testing.assert_array_equal(
            boards[i], runners[i].env.board(runners[i].state), err_msg=f"{alias}: initial board env {i}"
        )

    akey = jax.random.PRNGKey(seed + 77)
    actions = np.asarray(
        jax.random.randint(akey, (n_steps, n_envs), 0, env.n_actions)
    )
    jstep = jax.jit(vec.step)
    jboard = jax.jit(vec.board)
    for t in range(n_steps):
        vstate, out = jstep(vstate, jnp.asarray(actions[t]))
        boards = np.asarray(jboard(vstate))
        for i in range(n_envs):
            runners[i].step(actions[t, i])
            # After auto-reset both sides show the freshly reset board.
            np.testing.assert_array_equal(
                boards[i],
                runners[i].env.board(runners[i].state),
                err_msg=f"{alias}: board mismatch env {i} after step {t}",
            )
