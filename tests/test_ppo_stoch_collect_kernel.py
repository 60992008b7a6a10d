"""Stochastic fused PPO collect kernel (ops/ppo_stoch_collect_kernel.py).

Gates (the framework's fused-kernel standard):

1. host-replay equivalence — a NumPy replay of the four-stream protocol
   (inverse-CDF acting off the frozen policy tables, whisky noise on the
   EFFECTIVE action with the CHOSEN action + its logp in the records,
   coin/carried resets, tomato's pre-dry/dried index split) must
   reproduce trajectories, records, and episode accounting bitwise;
2. distribution-level consistency — collect episode stats vs the XLA
   collect (MXUPPOTrainer) with identical fresh params at 5σ;
3. composition — train_chunk (fused collect + fused optimize) runs on a
   stochastic env with finite loss and a working eval.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_grid_agents_tpu.agents.ppo import PPOAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.compiled import TableState, compile_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.training.ppo_mxu import MXUPPOTrainer
from safe_grid_agents_tpu.training.ppo_pallas import PallasPPOTrainer


def _make(alias):
    if alias in ("friend", "foe", "neutral"):
        return make_env(alias, compiled=True, cap=15)
    return compile_env(make_env(alias))


@pytest.mark.parametrize("alias", ["absent", "whisky", "tomato", "neutral"])
def test_ppo_stoch_collect_matches_host_replay(alias):
    cenv = _make(alias)
    agent = PPOAgent(cenv, net="table")
    N, T = 64, 32
    tr = PallasPPOTrainer(agent, MXUVecEnv(cenv, N))
    assert tr._stoch_collect
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)
    mstate2, _, stats, traj = tr.collect(astate, mstate, key, T)

    seng = tr._seng
    ks = jax.random.split(key, 5)
    u = np.asarray(jax.random.uniform(ks[0], (T, N)))
    bits = np.asarray(seng.draw_bits(ks[1], T, N))
    stumble = np.asarray(
        jax.random.bernoulli(ks[2], seng._p_noise, (T, N))
    ).astype(np.int32)
    rand_a = np.asarray(jax.random.randint(ks[3], (T, N), 0, tr.A))

    logits, value = agent.policy_value(astate.params, tr._all_states)
    logp_t = np.asarray(jax.nn.log_softmax(logits))
    cdf_t = np.asarray(jnp.cumsum(jax.nn.softmax(logits), -1))[:, :-1]
    val_t = np.asarray(value)
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    done_t = np.asarray(cenv.done_table)
    if seng._mode == 2:
        carry = np.asarray(MXUVecEnv(cenv, 1)._carry_tab)      # [2, S]
    if seng._noise:
        states = jax.vmap(cenv.base_state)(
            TableState(idx=jnp.arange(tr.S, dtype=jnp.int32),
                       t=jnp.zeros((tr.S,), jnp.int32))
        )
        drunk_tab = np.asarray(states.drunk)

    idx = np.asarray(mstate.idx).astype(np.int64).copy()
    t = np.asarray(mstate.t).astype(np.int64).copy()
    episodes = 0.0
    for s in range(T):
        a = (u[s][:, None] >= cdf_t[idx]).sum(-1)           # PRE-dry, chosen
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
        np.testing.assert_array_equal(np.asarray(traj["states"].idx)[s], idx)
        if seng._noise:
            eff = np.where(drunk_tab[idx] & (stumble[s] > 0), rand_a[s], a)
        else:
            eff = a
        if seng._dry_nbits:
            env_idx = idx - (idx & (2 ** seng._dry_nbits - 1) & bits[s])
        else:
            env_idx = idx
        nx = nxt_t[env_idx, eff]
        done = done_t[env_idx, eff] | (t + 1 >= cenv.max_steps)
        np.testing.assert_array_equal(
            np.asarray(traj["rewards"])[s], rew_t[env_idx, eff]
        )
        np.testing.assert_array_equal(np.asarray(traj["dones"])[s], done)
        np.testing.assert_array_equal(np.asarray(traj["next_idx"])[s], nx)
        episodes += done.sum()
        if seng._mode == 1:
            reset_lane = np.where(bits[s] > 0, seng._r1, seng._r0)
        elif seng._mode == 2:
            reset_lane = carry[bits[s], nx]
        else:
            reset_lane = np.full((N,), seng._r0)
        idx = np.where(done, reset_lane, nx)
        t = np.where(done, 0, t + 1)
    np.testing.assert_array_equal(np.asarray(mstate2.idx), idx)
    assert float(stats.episodes) == episodes


def test_ppo_stoch_collect_stats_consistent_with_xla_collect():
    """Same fresh params, different draw protocols: mean finished return
    per episode from the fused collect must agree with the XLA collect
    (MXUPPOTrainer) at 5σ over a long chunk."""
    cenv = compile_env(make_env("absent"))
    N, T = 256, 512

    def build(cls):
        agent = PPOAgent(cenv, net="table")
        tr = cls(agent, MXUVecEnv(cenv, N))
        astate, mstate = tr.init(jax.random.PRNGKey(0))
        return tr, astate, mstate

    tr_k, ak, mk = build(PallasPPOTrainer)
    tr_x, ax, mx = build(MXUPPOTrainer)
    _, _, sk, _ = tr_k.collect(ak, mk, jax.random.PRNGKey(1), T)
    _, _, sx, _ = tr_x.collect(ax, mx, jax.random.PRNGKey(2), T)
    n_k, n_x = float(sk.episodes), float(sx.episodes)
    assert n_k > 100 and n_x > 100, (n_k, n_x)
    m_k = float(sk.return_sum) / n_k
    m_x = float(sx.return_sum) / n_x
    sigma = 150.0 / np.sqrt(min(n_k, n_x))
    assert abs(m_k - m_x) < 5 * sigma, (m_k, m_x, sigma)


def test_ppo_stoch_train_chunk_composes():
    """Fused collect + fused optimize end-to-end on whisky: finite loss,
    sane episode accounting, working eval."""
    cenv = compile_env(make_env("whisky"))
    agent = PPOAgent(cenv, net="table", epochs=2, n_minibatches=4)
    tr = PallasPPOTrainer(agent, MXUVecEnv(cenv, 64))
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        astate, mstate, stats, loss = tr.train_chunk(astate, mstate, k, 32)
        assert np.isfinite(float(loss)), loss
    assert float(stats.episodes) >= 0
    _, es = tr.eval_chunk(
        astate, tr.vec.reset(jax.random.PRNGKey(7)), key, 110
    )
    assert np.isfinite(float(es.return_sum))
