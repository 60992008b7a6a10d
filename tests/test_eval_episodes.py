"""``--eval-episodes`` semantics (reference eval.py runs greedy rollouts for
``args.eval_episodes`` episodes — SURVEY.md §2a #4): eval steps until >=E
episodes finish, bounded by the step cap, and a window in which ZERO episodes
finish reports missing means (NaN), never a fake 0.0."""
import math

import jax
import pytest

from safe_grid_agents_tpu.agents import make_agent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.vec import VecEnv
from safe_grid_agents_tpu.training import make_trainer
from safe_grid_agents_tpu.training.common import ChunkStats, stats_to_host

N = 8


def _trainer(alias="corners", agent="random"):
    env = make_env(alias)
    return make_trainer(agent, make_agent(agent, env), VecEnv(env, N)), env


def test_min_episodes_stops_early():
    tr, env = _trainer()
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    cap = 10 * int(env.max_steps)
    echunk = jax.jit(tr.eval_chunk, static_argnums=(3, 4))
    _, es = echunk(astate, vstate, jax.random.PRNGKey(1), cap, 1)
    s = stats_to_host(es)
    assert s["episodes"] >= 1
    # Every instance times out within max_steps, so the while_loop must have
    # stopped no later than that — far under the 10x cap.
    assert s["env_steps"] <= env.max_steps * N
    # The fixed-length scan (min_episodes=None) runs the whole cap.
    _, es_full = echunk(astate, vstate, jax.random.PRNGKey(1), cap, None)
    full = stats_to_host(es_full)
    assert full["env_steps"] == cap * N
    assert full["episodes"] > s["episodes"]


def test_min_episodes_bounded_by_step_cap():
    tr, env = _trainer()
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    cap = 2 * int(env.max_steps)
    _, es = jax.jit(tr.eval_chunk, static_argnums=(3, 4))(
        astate, vstate, jax.random.PRNGKey(1), cap, 10**9
    )
    s = stats_to_host(es)
    # Unreachable target: the bound is a hard stop, not a hang.
    assert s["env_steps"] == cap * N


def test_min_episodes_on_mxu_eval_path():
    # The MXU trainers route through the same eval_chunk with state_view /
    # accumulate adapters (envs/mxu.py carry is index-native).
    from safe_grid_agents_tpu.agents.tabular import TabularQAgent
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.tabular_mxu import MXUTabularQTrainer

    env = make_env("shift", compiled=True)
    tr = MXUTabularQTrainer(TabularQAgent(env, lr=0.2), MXUVecEnv(env, N))
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    cap = 10 * int(env.max_steps)
    _, es = jax.jit(tr.eval_chunk, static_argnums=(3, 4))(
        astate, mstate, jax.random.PRNGKey(1), cap, 1
    )
    s = stats_to_host(es)
    assert s["episodes"] >= 1
    assert s["env_steps"] <= env.max_steps * N


def test_zero_episode_window_reports_missing_means():
    s = stats_to_host(ChunkStats.zero())
    assert s["episodes"] == 0.0
    assert math.isnan(s["mean_return"])
    assert math.isnan(s["mean_hidden"])
    assert math.isnan(s["mean_length"])


@pytest.mark.slow
def test_cli_eval_episodes_flag():
    from safe_grid_agents_tpu.cli.main import run

    s = run(
        [
            "corners", "random",
            "--steps", "128", "--n-envs", str(N), "--chunk-steps", "16",
            "--eval-steps", "4", "--eval-episodes", "16",
        ]
    )
    # --eval-steps 4 alone could never finish 16 episodes; the driver must
    # raise the bound so the episode target is met.
    assert s["episodes"] >= 16
