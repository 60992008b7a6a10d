"""Stochastic rollout kernel (ops/stoch_rollout_kernel.py).

Gates (the tabular kernel's standard — the engine has its OWN documented
bulk-draw protocol, so bitwise-vs-VecEnv is not the contract):

1. host-replay equivalence: a NumPy replay of the exact protocol over the
   compiled tables must reproduce the kernel's trajectories, final states
   and chunk accumulators for every covered mechanism (coin reset, carried
   coin reset, action noise, tomato's index drying);
2. episode-statistics consistency vs the parity-tested XLA MXU engine at
   5σ (same distributions, different draw order);
3. loud rejection for deterministic envs (which belong on the
   deterministic kernel).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.compiled import compile_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.ops.stoch_rollout_kernel import (
    PallasStochRolloutEngine,
)


def _host_replay(eng, cenv, idx0, actions, bits, stumble, rand_a):
    T, N = actions.shape
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    hid_t = np.asarray(cenv.hidden_table)
    done_t = np.asarray(cenv.done_table)
    mode = eng._mode
    if mode == 2:
        from safe_grid_agents_tpu.envs.compiled import TableState

        base = MXUVecEnv(cenv, 1)
        carry = np.asarray(base._carry_tab)          # [2, S]
    if eng._noise:
        from safe_grid_agents_tpu.envs.compiled import TableState

        states = jax.vmap(cenv.base_state)(
            TableState(idx=jnp.arange(eng.S, dtype=jnp.int32),
                       t=jnp.zeros((eng.S,), jnp.int32))
        )
        drunk_tab = np.asarray(states.drunk)
    idx = idx0.astype(np.int64).copy()
    t = np.zeros((N,), np.int64)
    epr = np.zeros((N,), np.float64)
    reward_sum = episodes = fin_ret = 0.0
    for s in range(T):
        if eng._dry_nbits:
            # tomato's drying: clear the streamed per-tomato mask bits of
            # the index before the table step (kernel module doc).
            idx = idx - (idx & (2 ** eng._dry_nbits - 1) & bits[s])
        a = actions[s].copy()
        if eng._noise:
            a = np.where(drunk_tab[idx] & (stumble[s] > 0), rand_a[s], a)
        nx = nxt_t[idx, a]
        r = rew_t[idx, a]
        done = done_t[idx, a] | (t + 1 >= cenv.max_steps)
        if mode == 1:
            reset_lane = np.where(bits[s] > 0, eng._r1, eng._r0)
        elif mode == 2:
            reset_lane = carry[bits[s], nx]
        else:
            reset_lane = np.full((N,), eng._r0)
        epr = epr + r
        reward_sum += r.sum()
        episodes += done.sum()
        fin_ret += (epr * done).sum()
        idx = np.where(done, reset_lane, nx)
        t = np.where(done, 0, t + 1)
        epr = np.where(done, 0.0, epr)
    return idx, t, reward_sum, episodes, fin_ret


@pytest.mark.parametrize("alias", ["absent", "interrupt", "whisky",
                                   "friend", "neutral", "tomato",
                                   "tomato-crmdp"])
def test_stoch_kernel_matches_host_replay(alias):
    cenv = make_env(alias, compiled=True, cap=15) if alias in (
        "friend", "foe", "neutral") else compile_env(make_env(alias))
    N, T = 64, 192
    eng = PallasStochRolloutEngine(cenv, N)
    key = jax.random.PRNGKey(5)
    k_reset, k_run = jax.random.split(key)
    state = eng.reset(k_reset)
    streams = eng.draw_streams(k_run, T)
    outs = eng.run_streams(state, *streams)
    (idx, t, epr, eph, epl, racc, eacc, facc) = outs

    np_streams = [np.asarray(s) for s in streams]
    idx_h, t_h, rs, eps, fr = _host_replay(
        eng, cenv, np.asarray(state[0])[0], *np_streams
    )
    np.testing.assert_array_equal(np.asarray(idx)[0], idx_h,
                                  err_msg=f"{alias}: final idx")
    np.testing.assert_array_equal(np.asarray(t)[0], t_h)
    assert float(racc.sum()) == rs, f"{alias}: reward sum"
    assert float(eacc.sum()) == eps, f"{alias}: episodes"
    assert float(facc.sum()) == fr, f"{alias}: finished returns"


@pytest.mark.parametrize("alias", ["absent", "whisky", "friend", "tomato"])
def test_stoch_kernel_stats_consistent_with_mxu_engine(alias):
    """Different draw order, same distributions: mean finished return per
    episode over a long random rollout must agree with the parity-tested
    XLA MXU engine within 5σ."""
    cenv = make_env(alias, compiled=True, cap=15) if alias in (
        "friend", "foe", "neutral") else compile_env(make_env(alias))
    N, T = 256, 512
    eng = PallasStochRolloutEngine(cenv, N)
    _, acc_k = eng.run_random_reduced(
        eng.reset(jax.random.PRNGKey(0)), jax.random.PRNGKey(1), T
    )
    mxu = MXUVecEnv(cenv, N)
    _, acc_m = jax.jit(mxu.run_random_reduced, static_argnums=2)(
        mxu.reset(jax.random.PRNGKey(2)), jax.random.PRNGKey(3), T
    )
    n_k, n_m = float(acc_k["episodes"]), float(acc_m["episodes"])
    assert n_k > 100 and n_m > 100, (alias, n_k, n_m)
    m_k = float(acc_k["finished_return_sum"]) / n_k
    m_m = float(acc_m["finished_return_sum"]) / n_m
    # Conservative scale: episode returns bounded by ~max_steps+goal ≈ 150;
    # σ of the mean ≲ 150/√n. 5σ with both samples.
    sigma = 150.0 / np.sqrt(min(n_k, n_m))
    assert abs(m_k - m_m) < 5 * sigma, (alias, m_k, m_m, sigma)


@pytest.mark.parametrize("alias", ["whisky", "tomato"])
def test_stoch_kernel_sharded_matches_single_device(alias):
    """shard_map'd stochastic kernel over 8 lane shards ≡ single-device,
    bitwise: the streams are drawn globally under the identical protocol
    and lane-split (same structure as the deterministic sharded engine).
    tomato pins the drying masks through the lane split too."""
    from safe_grid_agents_tpu.ops.stoch_rollout_kernel import (
        ShardedPallasStochRolloutEngine,
    )
    from safe_grid_agents_tpu.parallel import make_mesh

    cenv = compile_env(make_env(alias))
    N, T = 128, 96
    mesh = make_mesh(n_data=8, n_model=1)
    one = PallasStochRolloutEngine(cenv, N)
    sharded = ShardedPallasStochRolloutEngine(cenv, N, mesh)

    k_reset, k_run = jax.random.split(jax.random.PRNGKey(4))
    streams = one.draw_streams(k_run, T)
    outs_one = one.run_streams(one.reset(k_reset), *streams)
    outs_sh = jax.jit(sharded.run_streams)(sharded.reset(k_reset), *streams)
    for a, b in zip(outs_one, outs_sh):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    _, acc1 = one.run_random_reduced(one.reset(k_reset), k_run, T)
    _, acc2 = sharded.run_random_reduced(sharded.reset(k_reset), k_run, T)
    assert float(acc1["reward_sum"]) == float(acc2["reward_sum"])
    assert int(acc1["episodes"]) == int(acc2["episodes"])


def test_stoch_kernel_rejections():
    with pytest.raises(ValueError, match="deterministic"):
        PallasStochRolloutEngine(compile_env(make_env("shift")), 32)
