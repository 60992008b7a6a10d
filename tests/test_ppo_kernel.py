"""Fused PPO optimize kernel (ops/ppo_kernel.py + training/ppo_pallas.py).

The kernel reuses the XLA fast path's exact tile-shuffle membership (same
fold_in permutation draws), so a full train_chunk through both trainers
from identical keys differs ONLY in the hand-derived backward + per-tensor
clip/Adam vs XLA autodiff + flat-vector optax — i.e. float association.
The gates: params/loss allclose after 1 and 3 chunks (any error in the
backward formulas diverges far beyond tolerance), and multi-sub-block
geometry. Interpret mode on CPU; the TPU path is the same kernel compiled
(bench_train.py row).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_grid_agents_tpu.agents.ppo import PPOAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.training.ppo_mxu import MXUPPOTrainer
from safe_grid_agents_tpu.training.ppo_pallas import PallasPPOTrainer


def _allclose_tree(a, b, rtol, atol, msg):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
            err_msg=msg,
        )


@pytest.mark.parametrize("n_envs,chunk", [(64, 32), (128, 32)])
def test_ppo_kernel_matches_xla_fast_optimize(n_envs, chunk):
    """(64, 32): mb 512 = one sub-block/update; (128, 32): mb 1024 = two
    sub-blocks/update (exercises the gradient accumulation path)."""
    cenv = make_env("island", compiled=True)

    def build(cls):
        agent = PPOAgent(cenv, net="table", epochs=2, n_minibatches=4,
                         entropy_anneal_steps=5_000)
        tr = cls(agent, MXUVecEnv(cenv, n_envs))
        astate, mstate = tr.init(jax.random.PRNGKey(0))
        return tr, astate, mstate

    tr_x, ax, mx = build(MXUPPOTrainer)
    tr_k, ak, mk = build(PallasPPOTrainer)
    # Isolate the OPTIMIZE kernel: force the XLA collect on both trainers
    # so identical keys give bitwise-identical trajectories (the fused
    # collect has its own draw protocol — tested separately below).
    tr_k._fused_collect = False
    _allclose_tree(ax.params, ak.params, 0, 0, "init params differ")

    key = jax.random.PRNGKey(7)
    for step in range(3):
        key, k = jax.random.split(key)
        ax, mx, sx, lx = tr_x.train_chunk(ax, mx, k, chunk)
        ak, mk, sk, lk = tr_k.train_chunk(ak, mk, k, chunk)
        # Collect is the identical inherited code path → bitwise states.
        np.testing.assert_array_equal(np.asarray(mx.idx), np.asarray(mk.idx))
        assert float(sx.episodes) == float(sk.episodes)
        np.testing.assert_allclose(
            float(lx), float(lk), rtol=2e-5, atol=1e-6,
            err_msg=f"loss diverged at chunk {step}",
        )
        _allclose_tree(
            ax.params, ak.params, 2e-4, 2e-6,
            f"params diverged at chunk {step}",
        )
        # Adam state follows the same tolerance.
        adam_x, adam_k = ax.opt_state[1][0], ak.opt_state[1][0]
        assert int(adam_x.count) == int(adam_k.count)
        np.testing.assert_allclose(
            np.asarray(adam_x.mu), np.asarray(adam_k.mu),
            rtol=2e-4, atol=1e-6,
        )


@pytest.mark.slow
def test_ppo_kernel_learns_island():
    """Outcome gate through the fused trainer: island mean return must
    clearly improve over the random baseline within a short run."""
    from safe_grid_agents_tpu.training.common import stats_to_host

    cenv = make_env("island", compiled=True)
    agent = PPOAgent(cenv, net="table", lr=1e-3, epochs=4, n_minibatches=4,
                     entropy_bonus=0.01)
    tr = PallasPPOTrainer(agent, MXUVecEnv(cenv, 256))
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, k = jax.random.split(key)
        astate, mstate, stats, loss = chunk(astate, mstate, k, 16)
    _, es = tr.eval_chunk(
        astate, tr.vec.reset(jax.random.PRNGKey(5)), key, 120
    )
    s = stats_to_host(es)
    # Island optimum is 45 (random policy ≈ -50 and usually drowns); a
    # 120k-step run must be clearly positive.
    assert s["mean_return"] > 20.0, s


def test_ppo_collect_kernel_matches_host_replay():
    """Fused collect (ops/ppo_collect_kernel.py): NumPy replay of the
    inverse-CDF protocol over the same frozen-params policy tables must
    reproduce trajectories, records, and episode accounting bitwise."""
    cenv = make_env("island", compiled=True)
    agent = PPOAgent(cenv, net="table")
    N, T = 64, 32
    tr = PallasPPOTrainer(agent, MXUVecEnv(cenv, N))
    assert tr._fused_collect
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)
    mstate2, _, stats, traj = tr.collect(astate, mstate, key, T)

    k_u, _ = jax.random.split(key)
    u = np.asarray(jax.random.uniform(k_u, (T, N)))
    logits, value = agent.policy_value(astate.params, tr._all_states)
    logp_t = np.asarray(jax.nn.log_softmax(logits))
    cdf_t = np.asarray(jnp.cumsum(jax.nn.softmax(logits), -1))[:, :-1]
    val_t = np.asarray(value)
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    done_t = np.asarray(cenv.done_table)

    idx = np.full((N,), tr.vec.reset_idx, np.int64)
    t = np.zeros((N,), np.int64)
    episodes = 0.0
    for s in range(T):
        a = (u[s][:, None] >= cdf_t[idx]).sum(-1)
        np.testing.assert_array_equal(
            np.asarray(traj["actions"])[s], a, err_msg=f"step {s}: action"
        )
        np.testing.assert_array_equal(
            np.asarray(traj["old_logp"])[s], logp_t[idx, a],
            err_msg=f"step {s}: logp",
        )
        np.testing.assert_array_equal(
            np.asarray(traj["values"])[s], val_t[idx], err_msg="value"
        )
        np.testing.assert_array_equal(
            np.asarray(traj["states"].idx)[s], idx
        )
        nx = nxt_t[idx, a]
        done = done_t[idx, a] | (t + 1 >= cenv.max_steps)
        np.testing.assert_array_equal(
            np.asarray(traj["rewards"])[s], rew_t[idx, a]
        )
        np.testing.assert_array_equal(np.asarray(traj["dones"])[s], done)
        np.testing.assert_array_equal(np.asarray(traj["next_idx"])[s], nx)
        episodes += done.sum()
        idx = np.where(done, tr.vec.reset_idx, nx)
        t = np.where(done, 0, t + 1)
    np.testing.assert_array_equal(np.asarray(mstate2.idx), idx)
    assert float(stats.episodes) == episodes


def test_ppo_kernel_requires_table_net():
    cenv = make_env("island", compiled=True)
    agent = PPOAgent(cenv, net="mlp")
    with pytest.raises(AssertionError, match="table"):
        PallasPPOTrainer(agent, MXUVecEnv(cenv, 32))
