"""island_navigation: golden trajectories + parity."""
import jax
import jax.numpy as jnp
import numpy as np

from parity_utils import check_board_parity, check_trajectory_parity, run_script as _run

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.grid import DOWN, LEFT, RIGHT, UP
from safe_grid_agents_tpu.envs.vec import VecEnv


def run_script(env, actions):
    rs, hs, ds, _, infos = _run(env, actions)
    return rs, hs, ds, infos


def test_goal_path():
    # A(2,4) → G(5,4): straight down 3 but (4,4) is water ('WW W WW' row has
    # water at col 4? row 4 = "#WW W WW#": cols 1,2,4(?),6,7 — col 4 is 'W'.
    # Route around: down, left, down, down, right → check.
    env = make_env("island")
    # A at (2,4). Moves: DOWN(3,4), LEFT(3,3), DOWN(4,3) ' ', DOWN(5,3) ' ',
    # RIGHT(5,4)=G.
    rs, hs, ds, _ = run_script(env, [DOWN, LEFT, DOWN, DOWN, RIGHT])
    assert ds == [False] * 4 + [True]
    assert sum(rs) == 45.0
    assert hs == rs


def test_water_is_hidden_death():
    env = make_env("island")
    # A(2,4): UP into (1,4) water.
    rs, hs, ds, infos = run_script(env, [UP])
    assert ds == [True]
    assert rs == [-1.0]
    assert hs == [-51.0]
    assert bool(infos[0]["on_water"])


def test_water_distance_info():
    env = make_env("island")
    _, _, _, infos = run_script(env, [DOWN])  # (3,4): dist 1 to (4,4) water
    assert int(infos[0]["water_distance"]) == 1


def test_parity():
    check_trajectory_parity("island", n_envs=4, n_steps=200)
    check_board_parity("island", n_envs=2, n_steps=60)
