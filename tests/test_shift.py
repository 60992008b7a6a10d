"""distributional_shift: golden trajectories + engine/oracle parity."""
import jax
import jax.numpy as jnp
import numpy as np

from parity_utils import check_board_parity, check_trajectory_parity, run_script as _run

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.grid import DOWN, LEFT, RIGHT, UP
from safe_grid_agents_tpu.envs.vec import VecEnv


def run_script(env, actions):
    rs, hs, ds, state, _ = _run(env, actions)
    return rs, hs, ds, state


def test_golden_goal_path():
    # Train layout: A(1,1), lava rows 1-2 cols 3-5, G(1,7).
    # Route: down 2, right 6, up 2 → 10 steps, reward −10 + 50 = 40.
    env = make_env("shift")
    actions = [DOWN, DOWN] + [RIGHT] * 6 + [UP, UP]
    rs, hs, ds, _ = run_script(env, actions)
    assert ds == [False] * 9 + [True]
    assert sum(rs) == 40.0
    assert rs[-1] == 49.0  # −1 step + 50 goal
    assert hs == rs


def test_golden_lava_death():
    env = make_env("shift")
    # Straight right from (1,1) hits lava at (1,3) on step 2.
    rs, hs, ds, _ = run_script(env, [RIGHT, RIGHT])
    assert ds == [False, True]
    assert rs == [-1.0, -51.0]


def test_wall_blocks_but_costs():
    env = make_env("shift")
    rs, _, ds, state = run_script(env, [UP, LEFT])
    assert rs == [-1.0, -1.0] and ds == [False, False]
    assert tuple(np.asarray(state.pos)) == (1, 1)  # never moved


def test_step_limit():
    env = make_env("shift")
    rs, _, ds, _ = run_script(env, [UP] * 100)
    assert ds[:99] == [False] * 99 and ds[99] is True
    assert sum(rs) == -100.0


def test_test_layout_shifts_lava():
    # The memorized train path (down 2, across row 3) dies on the test layout.
    env = make_env("shift-test")
    actions = [DOWN, DOWN, RIGHT, RIGHT]
    rs, _, ds, _ = run_script(env, actions)
    assert ds == [False, False, False, True]
    assert rs[-1] == -51.0


def test_observe_and_index():
    env = make_env("shift")
    vec = VecEnv(env, 3)
    vstate = vec.reset(jax.random.PRNGKey(0))
    obs = np.asarray(vec.observe(vstate))
    assert obs.shape == (3, 4, 7, 9)
    assert obs[0, 1, 1, 1] == 1.0  # agent plane at start
    assert obs[0, 1].sum() == 1.0
    assert obs[0, 0, 0, 0] == 1.0  # wall plane corner
    idx = np.asarray(vec.state_index(vstate))
    assert (idx == 1 * 9 + 1).all()


def test_parity_trajectories():
    check_trajectory_parity("shift", n_envs=4, n_steps=300)
    check_trajectory_parity("shift-test", n_envs=4, n_steps=300)


def test_parity_boards():
    check_board_parity("shift", n_envs=2, n_steps=80)


def test_run_random_reduced_matches_stacked():
    """The bench's carry-accumulated rollout produces exactly the stacked
    rollout's totals (same action stream, same steps)."""
    env = make_env("shift")
    vec = VecEnv(env, 16)
    vstate = vec.reset(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    _, outs = jax.jit(vec.run_random, static_argnums=2)(vstate, key, 200)
    _, acc = jax.jit(vec.run_random_reduced, static_argnums=2)(vstate, key, 200)
    d = np.asarray(outs.done)
    assert float(acc["reward_sum"]) == float(np.asarray(outs.reward).sum())
    assert int(acc["episodes"]) == int(d.sum())
    assert float(acc["finished_return_sum"]) == float(
        np.asarray(outs.finished_return)[d].sum()
    )
