"""Native C++ oracle parity for the STOCHASTIC / stateful envs.

VERDICT r1 item 3: the NumPy oracle shares the engine's jax.random stream by
construction, so stochastic-env parity could not catch a wrong transition.
Here the C++ oracle (native/oracle.cpp — fully independent transition code)
steps the same trajectories; only the randomness OUTCOMES are shared: the
harness replicates VecEnv's documented key discipline (reset → per-step
(k_step, k_reset, k_next) splits) and materializes each env's documented
draws (tomato dry bits, whisky stumble/random-action, reset-time armed /
supervisor / coin bits), which the C++ side consumes as plain numbers.
The probabilities and the draw protocol itself are pinned separately by
tests/test_stochastic_stats.py (statistical, engine-behavior-only).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from native.build import STOCH_ENV_IDS, load_oracle, run_trajectory2  # noqa: E402

from safe_grid_agents_tpu.envs import make_env  # noqa: E402
from safe_grid_agents_tpu.envs.vec import VecEnv  # noqa: E402

T = 20_000


@pytest.fixture(scope="module")
def lib():
    return load_oracle()


def _key_streams(key, n_steps):
    """Replicate VecEnv's key discipline for n_envs=1: reset() derives
    (env reset key, carried key); each _step1 splits the carry into
    (k_step, k_reset, k_next)."""
    keys = jax.random.split(key, 1)
    init = jax.vmap(lambda k: jax.random.split(k, 2))(keys)  # [1, 2, 2]
    reset0, carry = init[0, 0], init[0, 1]

    def body(c, _):
        ks = jax.random.split(c, 3)
        return ks[2], (ks[0], ks[1])

    _, (k_steps, k_resets) = jax.lax.scan(body, carry, None, length=n_steps)
    return reset0, k_steps, k_resets


def _draw_streams(alias, env, reset0, k_steps, k_resets, dones):
    """Materialize the engine's documented draw outcomes for the C++ side."""
    n = len(dones)
    if alias in ("tomato", "tomato-crmdp"):
        step = jax.vmap(
            lambda k: jax.random.bernoulli(k, 0.05, (env.n_tomatoes,))
        )(k_steps).astype(np.float32)
        return np.asarray(step), np.zeros((0,), np.float32)
    if alias == "whisky":
        def draws(k):
            k1, k2 = jax.random.split(k)
            return jnp.stack([
                jax.random.bernoulli(k1, 0.9).astype(jnp.float32),
                jax.random.randint(k2, (), 0, env.n_actions).astype(jnp.float32),
            ])
        return np.asarray(jax.vmap(draws)(k_steps)), np.zeros((0,), np.float32)
    if alias in ("interrupt", "absent", "friend", "foe", "neutral"):
        bit = lambda k: jax.random.bernoulli(k, 0.5).astype(jnp.float32)  # noqa: E731
        first = np.asarray(bit(reset0))[None]
        per_step = np.asarray(jax.vmap(bit)(k_resets))
        resets = np.concatenate([first, per_step[np.asarray(dones)]])
        return np.zeros((n, 0), np.float32), resets
    # conveyor / conveyor-sushi / sokoban2: deterministic transitions.
    return np.zeros((n, 0), np.float32), np.zeros((0,), np.float32)


@pytest.mark.parametrize("alias", sorted(STOCH_ENV_IDS))
def test_native_stochastic_parity(lib, alias):
    env = make_env(alias)
    vec = VecEnv(env, 1)
    seed_key = jax.random.PRNGKey(7)
    vstate = vec.reset(seed_key)

    actions = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1234), (T,), 0, env.n_actions),
        np.int32,
    )
    _, outs = jax.jit(vec.run_actions)(vstate, actions[:, None])
    er = np.asarray(outs.reward)[:, 0]
    eh = np.asarray(outs.hidden_reward)[:, 0]
    ed = np.asarray(outs.done)[:, 0]

    reset0, k_steps, k_resets = _key_streams(seed_key, T)
    step_draws, reset_draws = _draw_streams(
        alias, env, reset0, k_steps, k_resets, ed
    )
    nr, nh, nd = run_trajectory2(lib, alias, actions, step_draws, reset_draws)

    np.testing.assert_array_equal(er, nr, err_msg=f"{alias}: rewards")
    np.testing.assert_array_equal(eh, nh, err_msg=f"{alias}: hiddens")
    np.testing.assert_array_equal(ed, nd, err_msg=f"{alias}: dones")
