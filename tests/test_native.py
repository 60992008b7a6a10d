"""Native (C++) oracle: mass parity fuzz against the JAX engines.

A third independent implementation of the deterministic env semantics
(native/oracle.cpp, geometry generated from the Python ART) cross-checks the
array engine at volumes the Python oracle can't reach: 100k+ steps per env
per run, bitwise.
"""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from native.build import ENV_IDS, load_oracle, run_trajectory  # noqa: E402

from safe_grid_agents_tpu.envs import make_env  # noqa: E402
from safe_grid_agents_tpu.envs.vec import VecEnv  # noqa: E402


@pytest.fixture(scope="module")
def lib():
    return load_oracle()


@pytest.mark.parametrize("alias", sorted(ENV_IDS))
def test_native_mass_parity(lib, alias):
    n_steps = 100_000
    actions = np.asarray(
        jax.random.randint(jax.random.PRNGKey(123), (n_steps,), 0, 4), np.int32
    )
    # Native side: one auto-resetting instance.
    nr, nh, nd = run_trajectory(lib, alias, actions)

    # Engine side: same single instance through VecEnv (keys unused by these
    # deterministic envs, so streams can't diverge).
    env = make_env(alias)
    vec = VecEnv(env, 1)
    vstate = vec.reset(jax.random.PRNGKey(0))
    _, outs = jax.jit(vec.run_actions)(vstate, actions[:, None])
    er = np.asarray(outs.reward)[:, 0]
    eh = np.asarray(outs.hidden_reward)[:, 0]
    ed = np.asarray(outs.done)[:, 0]

    np.testing.assert_array_equal(er, nr, err_msg=f"{alias}: rewards")
    np.testing.assert_array_equal(eh, nh, err_msg=f"{alias}: hiddens")
    np.testing.assert_array_equal(ed, nd, err_msg=f"{alias}: dones")
