"""Fused DQN update kernel (ops/dqn_update_kernel.py).

The kernel's sample protocol is its own (ONE bulk randint per chunk), so
the gate replays the SAME presampled batches through an XLA twin of the
update math — flat-param value_and_grad + optax adam + scheduled target
sync, exactly ``MXUDQNTrainer._update_scan``'s per-update program — and
demands allclose params/target/moments/loss after a multi-update run
crossing a target-sync boundary. Any error in the hand-written backward,
Adam, or sync scheduling diverges far beyond tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from safe_grid_agents_tpu.agents.dqn import DQNAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.ops.dqn_kernel import TB_REC
from safe_grid_agents_tpu.training.dqn_pallas import PallasDQNTrainer


def _xla_twin(agent, tr, astate, key, n_updates):
    """Replay the kernel's presampled batches through the XLA update math."""
    idxs = np.asarray(
        jax.random.randint(
            key, (n_updates, agent.batch_size), 0, astate.buffer.size
        )
    )
    flat_p, unravel = ravel_pytree(astate.params)
    flat_t = ravel_pytree(astate.target_params)[0]
    opt_state = astate.opt_state
    n_upd = int(astate.updates)
    losses = []
    for u in range(n_updates):
        batch = jax.tree.map(
            lambda s: s[idxs[u]], astate.buffer.storage
        )
        loss, g = jax.value_and_grad(
            lambda fp: agent.td_loss(unravel(fp), unravel(flat_t), batch)
        )(flat_p)
        updates, opt_state = agent.tx.update(g, opt_state, flat_p)
        flat_p = flat_p + updates
        n_upd += 1
        if n_upd % agent.sync_every == 0:
            flat_t = flat_p
        losses.append(float(loss))
    return unravel(flat_p), unravel(flat_t), opt_state, np.mean(losses)


@pytest.mark.parametrize("table,double_q", [(True, False), (False, False),
                                            (True, True)])
def test_dqn_update_kernel_matches_xla_twin(table, double_q):
    cenv = make_env("sokoban", compiled=True)
    agent = DQNAgent(
        cenv, table=table, double_q=double_q, lr=1e-3, batch_size=64,
        replay_capacity=4096, sync_every=3, hidden=(64, 64),
    )
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, 64))
    assert tr._fused_update
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    astate, mstate, _ = tr.warmup_chunk(
        astate, mstate, jax.random.PRNGKey(1), 2 * TB_REC
    )
    key = jax.random.PRNGKey(7)
    # 8 updates with sync_every=3 → two sync boundaries inside the run.
    a2, loss2 = tr._update_scan(astate, key, 8)
    p_x, t_x, opt_x, loss_x = _xla_twin(agent, tr, astate, key, 8)

    for la, lb in zip(jax.tree.leaves(a2.params), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-4, atol=1e-6,
            err_msg=f"params (table={table}, double_q={double_q})",
        )
    for la, lb in zip(
        jax.tree.leaves(a2.target_params), jax.tree.leaves(t_x)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-4, atol=1e-6,
            err_msg="target params",
        )
    np.testing.assert_allclose(float(loss2), loss_x, rtol=2e-5, atol=1e-7)
    assert int(a2.updates) == int(astate.updates) + 8
    adam2 = a2.opt_state[0]
    assert int(adam2.count) == int(astate.opt_state[0].count) + 8
    np.testing.assert_allclose(
        np.asarray(adam2.mu), np.asarray(opt_x[0].mu), rtol=2e-4, atol=1e-7
    )


def test_dqn_update_kernel_per_falls_back():
    cenv = make_env("sokoban", compiled=True)
    agent = DQNAgent(cenv, table=True, prioritized=True,
                     batch_size=32, replay_capacity=1024)
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, 32))
    assert not tr._fused_update  # PER pinned to the XLA update path
