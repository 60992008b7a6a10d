"""Pallas fused-MLP kernel: forward/gradient parity with the flax reference
(interpret mode on CPU; the same code compiles on TPU), plus PPO training
integration with net='pallas'."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from safe_grid_agents_tpu.agents.ppo import PPOAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.vec import VecEnv
from safe_grid_agents_tpu.ops.fused_mlp import PallasActorCriticMLP
from safe_grid_agents_tpu.training.ppo import PPOTrainer


def _reference(p, x, n_actions):
    xf = x.reshape(x.shape[0], -1)
    dp = p["w1"].shape[0]
    xp = jnp.zeros((x.shape[0], dp)).at[:, : xf.shape[1]].set(xf)
    h1 = jnp.tanh(xp @ p["w1"] + p["b1"])
    h2 = jnp.tanh(h1 @ p["w2"] + p["b2"])
    out = h2 @ p["wh"] + p["bh"]
    return out[:, :n_actions], out[:, n_actions]


def test_fused_mlp_forward_matches_reference():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (100, 4, 7, 9))  # non-multiple batch on purpose
    net = PallasActorCriticMLP(n_actions=4)
    params = net.init(key, x)
    logits, value = jax.jit(net.apply)(params, x)
    rl, rv = _reference(params["params"], x, 4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(rl), atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), np.asarray(rv), atol=1e-5)


def test_fused_mlp_gradients_match_reference():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (37, 4, 7, 9))
    net = PallasActorCriticMLP(n_actions=4)
    params = net.init(key, x)

    def loss_pallas(params):
        l, v = net.apply(params, x)
        return (l ** 2).sum() + (v ** 2).sum()

    def loss_ref(params):
        l, v = _reference(params["params"], x, 4)
        return (l ** 2).sum() + (v ** 2).sum()

    g1 = jax.grad(loss_pallas)(params)
    g2 = jax.grad(loss_ref)(params)
    for (k1, a), (k2, b) in zip(
        sorted(g1["params"].items()), sorted(g2["params"].items())
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3, err_msg=k1
        )


def test_ppo_pallas_net_trains():
    env = make_env("shift")
    vec = VecEnv(env, 32)
    agent = PPOAgent(env, net="pallas")
    tr = PPOTrainer(agent, vec)
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    astate, vstate, stats, loss = jax.jit(tr.train_chunk, static_argnums=3)(
        astate, vstate, jax.random.PRNGKey(1), 8
    )
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_ppo_table_net_matches_behavior():
    """Table-folded net (compiled envs): learns the same corners hack as the
    plain MLP and its fold rebinds across envs via for_env."""
    env = make_env("corners", compiled=True)
    vec = VecEnv(env, 64)
    agent = PPOAgent(env, net="table", lr=1e-3, entropy_bonus=0.05)
    tr = PPOTrainer(agent, vec)
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    key = jax.random.PRNGKey(1)
    for _ in range(50):
        key, k = jax.random.split(key)
        astate, vstate, stats, loss = chunk(astate, vstate, k, 16)
    assert np.isfinite(float(loss))
    from safe_grid_agents_tpu.training.common import eval_chunk, stats_to_host

    _, es = jax.jit(
        lambda a, v, k: eval_chunk(vec, agent.act, a, v, k, 25)
    )(astate, jax.jit(vec.reset)(jax.random.PRNGKey(7)), key)
    s = stats_to_host(es)
    assert s["mean_return"] > 30.0 and s["mean_hidden"] < -10.0

    # for_env rebind: same params drive the net on another compiled layout.
    env2 = make_env("way", compiled=True)
    a2 = agent.for_env(env2)
    acts = a2.act(astate, jax.tree.map(lambda x: x[:4], jax.jit(VecEnv(env2, 4).reset)(key).env), key)
    assert acts.shape == (4,)


@pytest.mark.slow
def test_dqn_table_net_learns_sokoban():
    from safe_grid_agents_tpu.agents.dqn import DQNAgent
    from safe_grid_agents_tpu.training.dqn import DQNTrainer
    from safe_grid_agents_tpu.training.common import stats_to_host

    env = make_env("sokoban", compiled=True)
    vec = VecEnv(env, 128)
    agent = DQNAgent(
        env, table=True, lr=5e-4, epsilon_anneal_steps=60_000,
        batch_size=128, replay_capacity=50_000, sync_every=100,
    )
    tr = DQNTrainer(agent, vec, updates_per_chunk=32)
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    astate, vstate, _ = jax.jit(tr.warmup_chunk, static_argnums=3)(
        astate, vstate, jax.random.PRNGKey(2), 40
    )
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    echunk = jax.jit(tr.eval_chunk, static_argnums=3)
    jreset = jax.jit(vec.reset)
    key = jax.random.PRNGKey(1)
    best = -1e9
    for i in range(15):
        key, k = jax.random.split(key)
        astate, vstate, stats, loss = chunk(astate, vstate, k, 32)
        if i >= 8:
            _, es = echunk(astate, jreset(jax.random.PRNGKey(7)), k, 120)
            best = max(best, stats_to_host(es)["mean_return"])
    assert best >= 40.0, f"table-net DQN best eval {best}"
