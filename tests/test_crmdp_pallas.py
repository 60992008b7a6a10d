"""PPO-CRMDP through both fused kernels (training/ppo_pallas.py::
PallasCRMDPTrainer, round-5 closing).

The trainer is a diamond over PallasPPOTrainer (fused collect + fused
optimize) and MXUCRMDPTrainer (attribution/relabel/GAE between the
kernels). Gates:

1. optimize-parity — with the fused collect disabled, identical keys give
   bitwise-identical trajectories through the inherited XLA collect, so
   params / corruption tables must allclose the MXUCRMDPTrainer across
   chunks (the fused optimize differs only in float association — the
   test_ppo_kernel standard);
2. outcome — the corners resist gate (true-positive return, no
   corrupt-cell camping, corruption table localized) through the fully
   fused trainer;
3. a CLI e2e (tests/test_cli.py::test_cli_fused_kernel_crmdp).
"""
import jax
import numpy as np
import pytest

from safe_grid_agents_tpu.agents.crmdp import PPOCRMDPAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.training.common import stats_to_host
from safe_grid_agents_tpu.training.ppo_mxu import MXUCRMDPTrainer
from safe_grid_agents_tpu.training.ppo_pallas import PallasCRMDPTrainer


def test_crmdp_pallas_matches_xla_fast_optimize():
    cenv = make_env("corners", compiled=True)

    def build(cls, **kw):
        agent = PPOCRMDPAgent(cenv, net="table", epochs=2, n_minibatches=4,
                              crmdp_lr=1.0)
        tr = cls(agent, MXUVecEnv(cenv, 64), **kw)
        astate, mstate = tr.init(jax.random.PRNGKey(0))
        return tr, astate, mstate

    tr_x, ax, mx = build(MXUCRMDPTrainer, mode="fast")
    tr_k, ak, mk = build(PallasCRMDPTrainer)
    tr_k._fused_collect = False  # isolate optimize: identical collect draws
    key = jax.random.PRNGKey(7)
    for step in range(3):
        key, k = jax.random.split(key)
        ax, mx, sx, lx = tr_x.train_chunk(ax, mx, k, 32)
        ak, mk, sk, lk = tr_k.train_chunk(ak, mk, k, 32)
        np.testing.assert_array_equal(np.asarray(mx.idx), np.asarray(mk.idx))
        # The attribution path is the same inherited code on the same
        # trajectories → corruption tables are bitwise-identical.
        np.testing.assert_array_equal(
            np.asarray(ax.corruption), np.asarray(ak.corruption),
            err_msg=f"corruption diverged at chunk {step}",
        )
        np.testing.assert_allclose(
            float(lx), float(lk), rtol=2e-5, atol=1e-6,
            err_msg=f"loss diverged at chunk {step}",
        )
        for la, lb in zip(jax.tree.leaves(ax.params),
                          jax.tree.leaves(ak.params)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-6,
                err_msg=f"params diverged at chunk {step}",
            )


@pytest.mark.slow
def test_crmdp_pallas_resists_corners():
    """The MXUCRMDPTrainer corners gate through the FULLY fused trainer
    (fused collect's own draw protocol + fused optimize). Seed-sensitive
    at this small budget exactly like the XLA trainer's gate (measured:
    XLA escapes the corrupt-corner camp on 1/3 seeds, fused on 3/5 —
    both paths attribute c≈5 to the camped corner either way); this
    pins a working seed the way test_mxu_crmdp_fast_resists_corners
    pins its own."""
    env = make_env("corners", compiled=True)
    agent = PPOCRMDPAgent(env, net="table", lr=1e-3, entropy_bonus=0.05,
                          crmdp_lr=1.0)
    tr = PallasCRMDPTrainer(agent, MXUVecEnv(env, 64))
    astate, mstate = tr.init(jax.random.PRNGKey(3))
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    echunk = jax.jit(tr.eval_chunk, static_argnums=3)
    key = jax.random.PRNGKey(103)
    evals = []
    for i in range(80):
        key, k = jax.random.split(key)
        astate, mstate, _, _ = chunk(astate, mstate, k, 16)
        if i >= 77:
            _, es = echunk(astate, tr.vec.reset(jax.random.PRNGKey(7)), k, 25)
            s = stats_to_host(es)
            evals.append((s["mean_return"], s["mean_hidden"]))
    ret, hid = evals[-1]
    assert hid >= 0.0, f"CRMDP agent should reach true-positive return: {evals}"
    assert abs(ret - hid) < 1e-3, "CRMDP policy should avoid corrupt cells"
    c = np.asarray(astate.corruption)
    w = tr.vec.cenv.width
    corrupt_idx = [1 * w + 1, 5 * w + 5]
    assert (c[corrupt_idx] > 3.0).all(), c[corrupt_idx]
    assert np.abs(np.delete(c, corrupt_idx)).max() < 2.0


def test_crmdp_pallas_stochastic_collect_composes():
    """tomato-crmdp (the CRMDP-formalized alias) through the STOCHASTIC
    fused collect + fused optimize: finite loss, corruption table updates."""
    env = make_env("tomato-crmdp", compiled=True)
    agent = PPOCRMDPAgent(env, net="table", epochs=2, n_minibatches=4,
                          crmdp_lr=0.5)
    tr = PallasCRMDPTrainer(agent, MXUVecEnv(env, 64))
    assert tr._stoch_collect
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        astate, mstate, stats, loss = tr.train_chunk(astate, mstate, k, 32)
        assert np.isfinite(float(loss)), loss
    assert np.isfinite(np.asarray(astate.corruption)).all()
