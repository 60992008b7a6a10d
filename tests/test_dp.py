"""Data-parallel runtime tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 item 4: same code 1-chip and N-device)."""
import jax
import numpy as np
import pytest

from safe_grid_agents_tpu.agents.crmdp import PPOCRMDPAgent
from safe_grid_agents_tpu.agents.dqn import DQNAgent
from safe_grid_agents_tpu.agents.ppo import PPOAgent
from safe_grid_agents_tpu.agents.tabular import TabularQAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.vec import VecEnv
from safe_grid_agents_tpu.parallel import DPTrainer, make_mesh
from safe_grid_agents_tpu.training.common import stats_to_host
from safe_grid_agents_tpu.training.crmdp import CRMDPTrainer
from safe_grid_agents_tpu.training.dqn import DQNTrainer
from safe_grid_agents_tpu.training.ppo import PPOTrainer
from safe_grid_agents_tpu.training.tabular import TabularQTrainer


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh()


def test_mesh_axes(mesh):
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_tabular_dp_learns_shift(mesh):
    env = make_env("shift")
    vec = VecEnv(env, 64)
    tr = DPTrainer(
        TabularQTrainer(TabularQAgent(env, lr=0.2, epsilon_anneal_steps=20_000), vec),
        mesh,
    )
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    key = jax.random.PRNGKey(1)
    for _ in range(10):
        key, k = jax.random.split(key)
        astate, vstate, stats = chunk(astate, vstate, k, 128)
    _, es = jax.jit(tr.eval_chunk, static_argnums=3)(astate, vstate, key, 30)
    s = stats_to_host(es)
    assert s["mean_return"] > 38.0, s
    # Q table must remain replicated across devices (psum-ed identical
    # updates): pulling it to host must not raise and stays finite.
    q = np.asarray(astate.q)
    assert np.isfinite(q).all()


def test_ppo_dp_chunk(mesh):
    env = make_env("shift")
    vec = VecEnv(env, 64)
    tr = DPTrainer(PPOTrainer(PPOAgent(env), vec), mesh)
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    astate, vstate, stats, loss = jax.jit(tr.train_chunk, static_argnums=3)(
        astate, vstate, jax.random.PRNGKey(1), 16
    )
    assert np.isfinite(float(loss))
    assert stats_to_host(stats)["env_steps"] == 16 * 64  # global, psum-ed


def test_dqn_dp_chunk_with_sharded_replay(mesh):
    env = make_env("sokoban")
    vec = VecEnv(env, 64)
    tr = DPTrainer(
        DQNTrainer(
            DQNAgent(env, replay_capacity=4096, batch_size=64), vec, updates_per_chunk=4
        ),
        mesh,
    )
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    astate, vstate, _ = jax.jit(tr.warmup_chunk, static_argnums=3)(
        astate, vstate, key, 16
    )
    # Each device owns an independent 4096/8 ring; 16 warmup steps push 8
    # local transitions each → replicated local size 128.
    assert int(astate.buffer.size) == 16 * 8
    astate, vstate, stats, loss = jax.jit(tr.train_chunk, static_argnums=3)(
        astate, vstate, key, 16
    )
    assert np.isfinite(float(loss))


def test_crmdp_dp_chunk(mesh):
    env = make_env("corners")
    vec = VecEnv(env, 64)
    tr = DPTrainer(CRMDPTrainer(PPOCRMDPAgent(env), vec), mesh)
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    astate, vstate, stats, loss = jax.jit(tr.train_chunk, static_argnums=3)(
        astate, vstate, jax.random.PRNGKey(1), 16
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(astate.corruption)).all()


@pytest.mark.slow
def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (128,)
    g.dryrun_multichip(8)


def test_cli_multi_device_non_dqn(mesh):
    """Regression: --n-devices with a warmup-less agent must not crash on
    the warmup gate (DPTrainer always had warmup_chunk; the base trainer
    does not)."""
    from safe_grid_agents_tpu.cli.main import run

    stats = run(
        [
            "shift", "ppo-mlp",
            "--n-devices", "8", "--n-envs", "64",
            "--steps", "4096", "--chunk-steps", "8",
            "--eval-every", "100", "--eval-steps", "10",
        ]
    )
    assert "mean_return" in stats


def test_cli_multi_device_dqn(mesh):
    from safe_grid_agents_tpu.cli.main import run

    stats = run(
        [
            "sokoban", "deep-q",
            "--n-devices", "8", "--n-envs", "64",
            "--steps", "4096", "--chunk-steps", "8",
            "--eval-every", "100", "--eval-steps", "10",
            "--replay-capacity", "4096", "--batch-size", "64",
            "--warmup-steps", "16",
        ]
    )
    assert "mean_return" in stats


def test_model_axis_tensor_parallel_expressible():
    """SURVEY.md §2d: the 'model' mesh axis is reserved so TP PartitionSpecs
    are expressible. Prove it: a weight sharded over 'model' and activations
    over 'data' run a jitted matmul on a (4, 2) mesh with GSPMD inserting
    the collectives."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    mesh42 = make_mesh(n_data=4, n_model=2)
    key = jax.random.PRNGKey(0)
    w = jax.device_put(
        jax.random.normal(key, (256, 128)), NamedSharding(mesh42, P(None, "model"))
    )
    x = jax.device_put(
        jax.random.normal(key, (64, 256)), NamedSharding(mesh42, P("data", None))
    )
    y = jax.jit(lambda x, w: jax.nn.relu(x @ w))(x, w)
    assert y.shape == (64, 128)
    np.testing.assert_allclose(
        np.asarray(y), np.maximum(np.asarray(x) @ np.asarray(w), 0), rtol=2e-4, atol=1e-4
    )


def test_prioritized_dqn_dp_sharded_priorities(mesh):
    """PER under DP: the priorities array must shard over 'data' alongside
    its storage (a replicated global priorities array against local storage
    shards scatters out of bounds and silently drops transitions)."""
    env = make_env("sokoban")
    vec = VecEnv(env, 64)
    tr = DPTrainer(
        DQNTrainer(
            DQNAgent(env, replay_capacity=4096, batch_size=64,
                     prioritized=True, double_q=True),
            vec,
            updates_per_chunk=4,
        ),
        mesh,
    )
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    from safe_grid_agents_tpu.parallel import DATA_AXIS

    assert DATA_AXIS in str(astate.buffer.priorities.sharding.spec)
    key = jax.random.PRNGKey(1)
    astate, vstate, _ = jax.jit(tr.warmup_chunk, static_argnums=3)(
        astate, vstate, key, 16
    )
    # 16 steps × 8 local envs per device fill 128 slots of each local ring;
    # every filled slot must carry the push-time max priority (1.0), every
    # other slot must still be invalid (0) — on EVERY device's shard.
    prios = np.asarray(astate.buffer.priorities).reshape(8, -1)
    assert prios.shape[1] == 4096 // 8
    assert (prios[:, :128] >= 1.0).all()
    assert (prios[:, 128:] == 0.0).all()
    astate, vstate, stats, loss = jax.jit(tr.train_chunk, static_argnums=3)(
        astate, vstate, key, 16
    )
    assert np.isfinite(float(loss))
    prios = np.asarray(astate.buffer.priorities).reshape(8, -1)
    assert (prios[:, 256:] == 0.0).all(), "scatter leaked past local rings"
