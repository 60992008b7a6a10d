"""Tensor-parallel (GSPMD dp×tp) runtime tests — parallel/tp.py.

The `model` mesh axis graduates from "expressible" (tests/test_dp.py) to
executed: dense kernels shard Megatron-style over `model`, env instances
over `data`, and the UNMODIFIED single-device trainer program runs under
GSPMD partitioning. Semantics must match the single-device run (same
program, same keys; tolerance covers partitioned reduction order).
"""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from safe_grid_agents_tpu.agents.dqn import DQNAgent
from safe_grid_agents_tpu.agents.ppo import PPOAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.vec import VecEnv
from safe_grid_agents_tpu.parallel import GSPMDTrainer, make_mesh, tp_param_specs
from safe_grid_agents_tpu.training.dqn import DQNTrainer
from safe_grid_agents_tpu.training.ppo import PPOTrainer


def _ppo_trainer(n_envs=32):
    env = make_env("island")
    agent = PPOAgent(env, net="mlp", hidden=(64, 64), epochs=2, n_minibatches=2)
    return PPOTrainer(agent, VecEnv(env, n_envs))


def test_tp_param_specs_megatron_alternation():
    trainer = _ppo_trainer()
    params = trainer.agent.init(jax.random.PRNGKey(0)).params
    specs = tp_param_specs(params)
    # Dense_0 column-parallel (+ its bias), Dense_1 row-parallel, tiny
    # policy/value heads replicated (absent from the table).
    assert specs[("Dense_0", "kernel")] == P(None, "model")
    assert specs[("Dense_0", "bias")] == P("model")
    assert specs[("Dense_1", "kernel")] == P("model", None)
    assert ("Dense_1", "bias") not in specs
    assert ("Dense_2", "kernel") not in specs
    assert ("Dense_3", "kernel") not in specs


def test_gspmd_ppo_matches_single_device():
    trainer = _ppo_trainer()
    mesh = make_mesh(n_data=4, n_model=2)
    tp = GSPMDTrainer(trainer, mesh)

    key = jax.random.PRNGKey(0)
    a1, v1 = trainer.init(key)
    a2, v2 = tp.init(key)

    # Kernels and optimizer moments really are distributed over 'model'.
    k = a2.params["params"]["Dense_0"]["kernel"]
    assert "model" in str(k.sharding.spec)
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(k.shape[0], k.shape[1] // 2)}
    mu_k = a2.opt_state[1][0].mu["params"]["Dense_0"]["kernel"]
    assert "model" in str(mu_k.sharding.spec)
    # Env states over 'data'.
    assert "data" in str(v2.env.pos.sharding.spec)

    c1 = jax.jit(trainer.train_chunk, static_argnums=3)
    c2 = jax.jit(tp.train_chunk, static_argnums=3)
    kc = jax.random.PRNGKey(1)
    for _ in range(2):
        kc, kk = jax.random.split(kc)
        a1, v1, s1, l1 = c1(a1, v1, kk, 8)
        a2, v2, s2, l2 = c2(a2, v2, kk, 8)

    # Same program, same keys — only partitioned float-reduction order may
    # differ.
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4, atol=1e-5)
    for pa, pb in zip(jax.tree.leaves(a1.params), jax.tree.leaves(a2.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=2e-5
        )
    assert float(s1.env_steps) == float(s2.env_steps)
    # Trajectories are key-determined, not partitioning-determined: episode
    # accounting is bitwise.
    assert float(s1.episodes) == float(s2.episodes)
    np.testing.assert_allclose(
        float(s1.return_sum), float(s2.return_sum), rtol=1e-5
    )


def test_gspmd_dqn_runs_with_sharded_replay():
    env = make_env("sokoban")
    agent = DQNAgent(env, hidden=(64, 64), batch_size=64, replay_capacity=4096)
    trainer = DQNTrainer(agent, VecEnv(env, 32))
    mesh = make_mesh(n_data=4, n_model=2)
    tp = GSPMDTrainer(trainer, mesh)

    astate, vstate = tp.init(jax.random.PRNGKey(0))
    storage_leaf = jax.tree.leaves(astate.buffer.storage)[0]
    assert "data" in str(storage_leaf.sharding.spec)

    astate, vstate, _ = jax.jit(tp.warmup_chunk, static_argnums=3)(
        astate, vstate, jax.random.PRNGKey(1), 16
    )
    out = jax.jit(tp.train_chunk, static_argnums=3)(
        astate, vstate, jax.random.PRNGKey(2), 8
    )
    loss = float(out[3])
    assert np.isfinite(loss)


def test_cli_tp(tmp_path):
    from safe_grid_agents_tpu.cli.main import run

    stats = run(
        [
            "island", "ppo-mlp",
            "--n-envs", "32", "--steps", "2048", "--chunk-steps", "8",
            "--eval-every", "4", "--eval-steps", "12",
            "--n-devices", "8", "--tp", "2",
            "--log-dir", str(tmp_path),
        ]
    )
    assert np.isfinite(stats["mean_return"])
