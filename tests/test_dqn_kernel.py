"""Fused DQN collect kernel (ops/dqn_kernel.py + training/dqn_pallas.py).

The kernel's RNG protocol is its own (bulk presampled draws — module
docstring), so the gates are the tabular kernel's: (1) host-replay
equivalence — replay the SAME presampled draws through a NumPy
implementation of the protocol and demand identical trajectories, records,
and episode accounting; (2) the update phase is inherited from
MXUDQNTrainer, so pushing the kernel's records must leave the ring
identical to pushing the replayed records; (3) outcome gates — sokoban
optimum through the trainer. Interpret mode on CPU; the TPU path is the
same kernel compiled (bench_train.py row).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_grid_agents_tpu.agents.dqn import DQNAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.compiled import TableState, compile_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.ops.dqn_kernel import TB_REC, dqn_collect_run
from safe_grid_agents_tpu.training.common import stats_to_host
from safe_grid_agents_tpu.training.dqn_pallas import PallasDQNTrainer


def _host_replay(cenv, q_all, reset_idx, eps0, epsf, anneal, step0,
                 rand_a, u, idx0, t0):
    """NumPy replay of the kernel's documented protocol."""
    T, N = rand_a.shape
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    hid_t = np.asarray(cenv.hidden_table)
    done_t = np.asarray(cenv.done_table)
    idx, t = idx0.copy(), t0.copy()
    recs = {k: [] for k in ("pidx", "pt", "act", "rew", "nidx", "done")}
    episodes = ret_sum = 0.0
    epr = np.zeros((N,), np.float64)
    step = step0
    for s in range(T):
        frac = min(max(step / anneal, 0.0), 1.0)
        eps = np.float32(eps0 + frac * (epsf - eps0))
        greedy = q_all[idx].argmax(-1)          # first-max, like the kernel
        a = np.where(u[s] < eps, rand_a[s], greedy)
        nxt = nxt_t[idx, a]
        r = rew_t[idx, a]
        done = done_t[idx, a] | (t + 1 >= cenv.max_steps)
        recs["pidx"].append(idx.copy())
        recs["pt"].append(t.copy())
        recs["act"].append(a)
        recs["rew"].append(r)
        recs["nidx"].append(nxt)
        recs["done"].append(done)
        epr = epr + r
        episodes += done.sum()
        ret_sum += (epr * done).sum()
        idx = np.where(done, reset_idx, nxt)
        t = np.where(done, 0, t + 1)
        epr = np.where(done, 0.0, epr)
        step += N
    return idx, t, {k: np.stack(v) for k, v in recs.items()}, episodes, ret_sum


@pytest.mark.parametrize("alias", ["shift", "sokoban"])
def test_dqn_kernel_records_match_host_replay(alias):
    cenv = compile_env(make_env(alias))
    N, T = 64, 2 * TB_REC
    agent = DQNAgent(cenv, table=True, epsilon=0.6,
                     epsilon_anneal_steps=5_000, replay_capacity=4096)
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, N))
    astate, mstate = tr.init(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(9)
    k_a, k_u, _ = jax.random.split(key, 3)
    rand_a = np.asarray(jax.random.randint(k_a, (T, N), 0, cenv.n_actions))
    u = np.asarray(jax.random.uniform(k_u, (T, N)))
    q_all = np.asarray(agent.q_values(astate.params, tr._all_states))

    astate2, mstate2, _, stats = tr._collect(
        astate, mstate, key, T, random_policy=False
    )
    idx_h, t_h, recs, episodes, ret_sum = _host_replay(
        cenv, q_all, tr.vec.reset_idx, agent.epsilon, agent.epsilon_final,
        float(agent.epsilon_anneal_steps), 0,
        rand_a, u, np.full((N,), tr.vec.reset_idx, np.int64),
        np.zeros((N,), np.int64),
    )
    np.testing.assert_array_equal(np.asarray(mstate2.idx), idx_h)
    np.testing.assert_array_equal(np.asarray(mstate2.t), t_h)
    assert float(stats.episodes) == episodes
    assert abs(float(stats.return_sum) - ret_sum) < 1e-3
    assert int(astate2.step) == T * N

    # Ring content: the pushed stream must equal the replayed records
    # pushed the same way (time-major, n_step=1 ⇒ bitwise per-step order).
    buf = astate2.buffer
    n_rec = T * N
    flat = lambda x: x.reshape(T * N, *x.shape[2:])  # noqa: E731
    np.testing.assert_array_equal(
        np.asarray(buf.storage.state.idx)[:n_rec], flat(recs["pidx"])
    )
    np.testing.assert_array_equal(
        np.asarray(buf.storage.action)[:n_rec], flat(recs["act"])
    )
    np.testing.assert_array_equal(
        np.asarray(buf.storage.reward)[:n_rec],
        flat(recs["rew"]).astype(np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(buf.storage.next_state.idx)[:n_rec], flat(recs["nidx"])
    )
    np.testing.assert_array_equal(
        np.asarray(buf.storage.next_state.t)[:n_rec], flat(recs["pt"] + 1)
    )
    np.testing.assert_array_equal(
        np.asarray(buf.storage.done)[:n_rec], flat(recs["done"])
    )


def test_dqn_kernel_multi_lane_block_matches_single():
    """sokoban's S=1296 forces NB < N: the lane-block grid path must agree
    with a narrow single-block run lane-for-lane (same draws per lane)."""
    cenv = compile_env(make_env("sokoban"))
    agent = DQNAgent(cenv, table=True, replay_capacity=2048)
    N, T = 64, TB_REC
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, N))
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    # Force the multi-block path by shrinking the static lane block
    # (index 4 of the static tuple).
    s = tr._static
    tr._static = s[:4] + (16,) + s[5:]
    a2, m2, _, st2 = tr._collect(astate, mstate, jax.random.PRNGKey(3), T,
                                 random_policy=False)
    tr._static = s
    a1, m1, _, st1 = tr._collect(astate, mstate, jax.random.PRNGKey(3), T,
                                 random_policy=False)
    np.testing.assert_array_equal(np.asarray(m1.idx), np.asarray(m2.idx))
    np.testing.assert_array_equal(
        np.asarray(a1.buffer.storage.state.idx),
        np.asarray(a2.buffer.storage.state.idx),
    )
    assert float(st1.episodes) == float(st2.episodes)


def test_dqn_kernel_warmup_is_random_policy():
    """ε pinned to 1.0 ⇒ every action is the presampled uniform draw."""
    cenv = compile_env(make_env("shift"))
    agent = DQNAgent(cenv, table=True, replay_capacity=4096)
    N, T = 32, TB_REC
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, N))
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(4)
    astate2, _, stats = tr.warmup_chunk(astate, mstate, key, T)
    k_a, _, _ = jax.random.split(key, 3)
    rand_a = np.asarray(jax.random.randint(k_a, (T, N), 0, cenv.n_actions))
    got = np.asarray(astate2.buffer.storage.action)[: T * N]
    np.testing.assert_array_equal(got, rand_a.reshape(-1))
    assert float(stats.env_steps) == T * N


@pytest.mark.parametrize("alias", ["absent", "whisky", "tomato", "neutral"])
def test_dqn_stoch_collect_matches_host_replay(alias):
    """Stochastic fused collect (round 5, ops/dqn_stoch_kernel.py): NumPy
    replay of the five-stream protocol — greedy off the frozen Q table,
    whisky noise on the EFFECTIVE action, the CHOSEN action in the
    records, coin resets, carried coin resets (friend family), tomato's
    drying (greedy + records at the PRE-dry index, env at the DRIED
    index) — must reproduce trajectories and ring content."""
    cenv = (
        make_env(alias, compiled=True, cap=15)
        if alias in ("friend", "foe", "neutral")
        else compile_env(make_env(alias))
    )
    N, T = 64, 2 * TB_REC
    agent = DQNAgent(cenv, table=True, epsilon=0.6,
                     epsilon_anneal_steps=5_000, replay_capacity=4096)
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, N))
    assert tr._stochastic
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)
    astate2, mstate2, _, stats = tr._collect(
        astate, mstate, key, T, random_policy=False
    )

    ks = jax.random.split(key, 6)
    rand_a = np.asarray(jax.random.randint(ks[0], (T, N), 0, cenv.n_actions))
    u = np.asarray(jax.random.uniform(ks[1], (T, N)))
    bits = np.asarray(tr._seng.draw_bits(ks[2], T, N))
    stumble = np.asarray(
        jax.random.bernoulli(ks[3], tr._seng._p_noise, (T, N))
    ).astype(np.int32)
    rand2 = np.asarray(jax.random.randint(ks[4], (T, N), 0, cenv.n_actions))
    q_all = np.asarray(agent.q_values(astate.params, tr._all_states))

    seng = tr._seng
    if seng._noise:
        from safe_grid_agents_tpu.envs.compiled import TableState

        states = jax.vmap(cenv.base_state)(
            TableState(idx=jnp.arange(tr.S, dtype=jnp.int32),
                       t=jnp.zeros((tr.S,), jnp.int32))
        )
        drunk_tab = np.asarray(states.drunk)
    if seng._mode == 2:
        carry = np.asarray(MXUVecEnv(cenv, 1)._carry_tab)   # [2, S]
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    done_t = np.asarray(cenv.done_table)

    idx = np.asarray(mstate.idx).astype(np.int64).copy()
    t = np.asarray(mstate.t).astype(np.int64).copy()
    buf = astate2.buffer
    step = 0
    episodes = 0.0
    for s in range(T):
        frac = min(max(step / agent.epsilon_anneal_steps, 0.0), 1.0)
        eps = agent.epsilon + frac * (agent.epsilon_final - agent.epsilon)
        greedy = q_all[idx].argmax(-1)                      # PRE-dry
        a = np.where(u[s] < eps, rand_a[s], greedy)         # chosen
        if seng._noise:
            eff = np.where(drunk_tab[idx] & (stumble[s] > 0), rand2[s], a)
        else:
            eff = a
        if seng._dry_nbits:
            env_idx = idx - (idx & (2 ** seng._dry_nbits - 1) & bits[s])
        else:
            env_idx = idx
        nx = nxt_t[env_idx, eff]
        r = rew_t[env_idx, eff]
        done = done_t[env_idx, eff] | (t + 1 >= cenv.max_steps)
        sl = slice(s * N, (s + 1) * N)
        np.testing.assert_array_equal(
            np.asarray(buf.storage.state.idx)[sl], idx, f"step {s}: pidx"
        )
        np.testing.assert_array_equal(
            np.asarray(buf.storage.action)[sl], a, f"step {s}: action"
        )
        np.testing.assert_array_equal(
            np.asarray(buf.storage.reward)[sl], r.astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(buf.storage.next_state.idx)[sl], nx
        )
        np.testing.assert_array_equal(
            np.asarray(buf.storage.done)[sl], done
        )
        episodes += done.sum()
        if seng._mode == 1:
            reset_lane = np.where(bits[s] > 0, seng._r1, seng._r0)
        elif seng._mode == 2:
            reset_lane = carry[bits[s], nx]
        else:
            reset_lane = np.full((N,), seng._r0)
        idx = np.where(done, reset_lane, nx)
        t = np.where(done, 0, t + 1)
        step += N
    np.testing.assert_array_equal(np.asarray(mstate2.idx), idx)
    assert float(stats.episodes) == episodes


def test_dqn_stoch_kernel_learns_whisky():
    """Outcome gate: the quick-config deep-q suite row on whisky is
    ≈36 observed (it drinks); the fused trainer must clearly learn
    (random ≈ −60)."""
    cenv = compile_env(make_env("whisky"))
    agent = DQNAgent(
        cenv, lr=5e-4, epsilon_anneal_steps=60_000, batch_size=128,
        replay_capacity=50_000, sync_every=100,
    )
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, 128), updates_per_chunk=32)
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    astate, mstate, _ = jax.jit(tr.warmup_chunk, static_argnums=3)(
        astate, mstate, jax.random.PRNGKey(2), 2 * TB_REC
    )
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    echunk = jax.jit(tr.eval_chunk, static_argnums=3)
    key = jax.random.PRNGKey(1)
    best = -1e9
    for i in range(15):
        key, k = jax.random.split(key)
        astate, mstate, stats, loss = chunk(astate, mstate, k, 2 * TB_REC)
        if i >= 8:
            _, es = echunk(astate, tr.vec.reset(jax.random.PRNGKey(7)), k, 60)
            best = max(best, stats_to_host(es)["mean_return"])
    assert best >= 25.0, f"fused stoch DQN whisky best eval {best}"


def test_dqn_kernel_learns_sokoban():
    """Same geometry as test_mxu_dqn_trainer_learns_sokoban (61 k steps,
    best-of eval from chunk 8): the fused-collect trainer must reach the
    sokoban optimum despite its different (bulk-draw) RNG protocol."""
    cenv = compile_env(make_env("sokoban"))
    agent = DQNAgent(
        cenv, lr=5e-4, epsilon_anneal_steps=60_000, batch_size=128,
        replay_capacity=50_000, sync_every=100,
    )
    tr = PallasDQNTrainer(agent, MXUVecEnv(cenv, 128),
                          updates_per_chunk=32)
    astate, mstate = tr.init(jax.random.PRNGKey(0))
    astate, mstate, _ = jax.jit(tr.warmup_chunk, static_argnums=3)(
        astate, mstate, jax.random.PRNGKey(2), 2 * TB_REC
    )
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    echunk = jax.jit(tr.eval_chunk, static_argnums=3)
    key = jax.random.PRNGKey(1)
    best = -1e9
    for i in range(15):
        key, k = jax.random.split(key)
        astate, mstate, stats, loss = chunk(astate, mstate, k, 2 * TB_REC)
        if i >= 8:
            _, es = echunk(astate, tr.vec.reset(jax.random.PRNGKey(7)), k, 60)
            best = max(best, stats_to_host(es)["mean_return"])
    assert best >= 40.0, f"fused-collect DQN best eval {best}"
