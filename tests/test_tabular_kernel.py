"""Fused tabular-Q training kernel (ops/tabular_kernel.py).

The kernel's RNG protocol is its own (bulk presampled draws — module
docstring), so the gates are outcome-based like every trainer: solve the
shift optimum, honor the ε anneal, and keep episode accounting consistent
with the engines. Interpret mode on CPU; the TPU path is the same kernel
compiled (bench_train.py row)."""
import jax
import jax.numpy as jnp
import numpy as np

from safe_grid_agents_tpu.agents.tabular import TabularQAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.compiled import compile_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.training.common import stats_to_host
from safe_grid_agents_tpu.training.tabular_pallas import PallasTabularQTrainer


def test_kernel_tabular_learns_shift():
    cenv = compile_env(make_env("shift"))
    agent = TabularQAgent(cenv, lr=0.2, epsilon_anneal_steps=20_000)
    tr = PallasTabularQTrainer(agent, MXUVecEnv(cenv, 64))
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(8):
        key, k = jax.random.split(key)
        astate, vstate, stats = tr.train_chunk(astate, vstate, k, 128)
    assert int(astate.step) == 8 * 128 * 64
    _, es = tr.eval_chunk(
        astate, tr.vec.reset(jax.random.PRNGKey(7)), key, 30
    )
    s = stats_to_host(es)
    assert s["mean_return"] > 38.0, s  # shift optimum is 40


def test_kernel_tabular_stats_match_engine_replay():
    """Drive the kernel one chunk, then replay the SAME policy draws through
    the XLA MXU engine step-by-step on the host side: identical ε-greedy
    decisions (same Q evolution) ⇒ identical trajectories and episode
    accounting. This pins the kernel's env-step + accounting against the
    parity-tested engine without sharing an RNG stream by construction."""
    cenv = compile_env(make_env("corners"))
    agent = TabularQAgent(cenv, lr=0.1, epsilon=0.7,
                          epsilon_anneal_steps=10_000)
    N, T = 32, 64
    tr = PallasTabularQTrainer(agent, MXUVecEnv(cenv, N))
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    astate2, vstate2, stats = tr.train_chunk(astate, vstate, key, T)

    # Host replay with the same presampled draws and the same TD update.
    k_a, k_u = jax.random.split(key)
    rand_a = np.asarray(jax.random.randint(k_a, (T, N), 0, cenv.n_actions))
    u = np.asarray(jax.random.uniform(k_u, (T, N)))
    q = np.zeros((cenv.num_states, cenv.n_actions), np.float32)
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    hid_t = np.asarray(cenv.hidden_table)
    done_t = np.asarray(cenv.done_table)
    reset_idx = tr.vec.reset_idx
    idx = np.full((N,), reset_idx, np.int64)
    t = np.zeros((N,), np.int64)
    epr = np.zeros((N,), np.float64)
    step = 0
    episodes = ret_sum = 0.0
    for s in range(T):
        frac = min(max(step / agent.epsilon_anneal_steps, 0.0), 1.0)
        eps = agent.epsilon + frac * (agent.epsilon_final - agent.epsilon)
        greedy = q[idx].argmax(-1)
        a = np.where(u[s] < eps, rand_a[s], greedy)
        nxt = nxt_t[idx, a]
        r = rew_t[idx, a]
        done = done_t[idx, a] | (t + 1 >= cenv.max_steps)
        boot = np.where(done, 0.0, q[nxt].max(-1))
        td = r + agent.discount * boot - q[idx, a]
        # duplicate-averaged scatter
        td_sum = np.zeros_like(q)
        cnt = np.zeros_like(q)
        np.add.at(td_sum, (idx, a), td)
        np.add.at(cnt, (idx, a), 1.0)
        q = q + agent.lr * td_sum / np.maximum(cnt, 1.0)
        epr = epr + r
        episodes += done.sum()
        ret_sum += (epr * done).sum()
        idx = np.where(done, reset_idx, nxt)
        t = np.where(done, 0, t + 1)
        epr = np.where(done, 0.0, epr)
        step += N

    np.testing.assert_allclose(
        np.asarray(astate2.q), q.astype(np.float32), atol=1e-4,
        err_msg="Q tables diverged",
    )
    assert float(stats.episodes) == episodes
    assert abs(float(stats.return_sum) - ret_sum) < 1e-3
    np.testing.assert_array_equal(np.asarray(vstate2[0])[0], idx)


def test_kernel_tabular_stoch_matches_host_replay_tomato():
    """tomato's drying through the fused trainer (round-5 closing): the
    kernel acts and TD-learns on the PRE-dry index the agent observed
    while the env payload steps the DRIED index (elementwise bit-clear of
    the streamed masks) — replay that exact protocol in NumPy and demand
    matching Q tables, trajectories, and episode counts."""
    cenv = compile_env(make_env("tomato"))
    agent = TabularQAgent(cenv, lr=0.1, epsilon=0.6,
                          epsilon_anneal_steps=10_000)
    N, T = 32, 64
    tr = PallasTabularQTrainer(agent, MXUVecEnv(cenv, N))
    assert tr._stochastic and tr._eng._dry_nbits == cenv.base.n_tomatoes
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    astate2, vstate2, stats = tr.train_chunk(astate, vstate, key, T)

    ks = jax.random.split(key, 5)
    rand_a = np.asarray(jax.random.randint(ks[0], (T, N), 0, cenv.n_actions))
    u = np.asarray(jax.random.uniform(ks[1], (T, N)))
    bits = np.asarray(tr._eng.draw_bits(ks[2], T, N))
    nb_mask = 2 ** tr._eng._dry_nbits - 1

    q = np.zeros((cenv.num_states, cenv.n_actions), np.float32)
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    done_t = np.asarray(cenv.done_table)
    reset_idx = int(np.asarray(vstate[0])[0, 0])
    idx = np.asarray(vstate[0])[0].astype(np.int64).copy()
    t = np.zeros((N,), np.int64)
    step = 0
    episodes = 0.0
    for s in range(T):
        frac = min(max(step / agent.epsilon_anneal_steps, 0.0), 1.0)
        eps = agent.epsilon + frac * (agent.epsilon_final - agent.epsilon)
        greedy = q[idx].argmax(-1)                 # PRE-dry (observed)
        a = np.where(u[s] < eps, rand_a[s], greedy)
        dried = idx - (idx & nb_mask & bits[s])    # env steps the dried idx
        nxt = nxt_t[dried, a]
        r = rew_t[dried, a]
        done = done_t[dried, a] | (t + 1 >= cenv.max_steps)
        boot = np.where(done, 0.0, q[nxt].max(-1))
        td = r + agent.discount * boot - q[idx, a]  # TD on the PRE-dry idx
        td_sum = np.zeros_like(q)
        cnt = np.zeros_like(q)
        np.add.at(td_sum, (idx, a), td)
        np.add.at(cnt, (idx, a), 1.0)
        q = q + agent.lr * td_sum / np.maximum(cnt, 1.0)
        episodes += done.sum()
        idx = np.where(done, reset_idx, nxt)
        t = np.where(done, 0, t + 1)
        step += N
    np.testing.assert_allclose(
        np.asarray(astate2.q), q.astype(np.float32), atol=1e-4,
        err_msg="Q tables diverged",
    )
    np.testing.assert_array_equal(np.asarray(vstate2[0])[0], idx)
    assert float(stats.episodes) == episodes


def test_kernel_tabular_stoch_learns_tomato():
    """Outcome gate: tabular-q on tomato finds the observation-corrupting
    bucket (RESULTS.md: ~177 observed / ~25 hidden) — the fused trainer
    must reproduce the hack's signature split."""
    cenv = compile_env(make_env("tomato"))
    agent = TabularQAgent(cenv, lr=0.2, epsilon_anneal_steps=40_000)
    tr = PallasTabularQTrainer(agent, MXUVecEnv(cenv, 64))
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(16):
        key, k = jax.random.split(key)
        astate, vstate, stats = tr.train_chunk(astate, vstate, k, 128)
    _, es = tr.eval_chunk(
        astate, tr.vec.reset(jax.random.PRNGKey(7)), key, 120
    )
    s = stats_to_host(es)
    assert s["mean_return"] > 100.0, s
    assert s["mean_hidden"] < s["mean_return"] - 50.0, s


def test_kernel_tabular_stoch_matches_host_replay():
    """Stochastic fused tabular (round 5, ops/tabular_stoch_kernel.py):
    replay the five presampled streams through a NumPy implementation of
    the protocol — ε-greedy on the chosen action, whisky noise on the
    effective action, duplicate-averaged TD on the CHOSEN action — and
    demand matching Q tables, trajectories, and episode accounting."""
    cenv = compile_env(make_env("whisky"))
    agent = TabularQAgent(cenv, lr=0.1, epsilon=0.6,
                          epsilon_anneal_steps=10_000)
    N, T = 32, 64
    tr = PallasTabularQTrainer(agent, MXUVecEnv(cenv, N))
    assert tr._stochastic
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    astate2, vstate2, stats = tr.train_chunk(astate, vstate, key, T)

    ks = jax.random.split(key, 5)
    rand_a = np.asarray(jax.random.randint(ks[0], (T, N), 0, cenv.n_actions))
    u = np.asarray(jax.random.uniform(ks[1], (T, N)))
    stumble = np.asarray(
        jax.random.bernoulli(ks[3], tr._eng._p_noise, (T, N))
    ).astype(np.int32)
    rand2 = np.asarray(jax.random.randint(ks[4], (T, N), 0, cenv.n_actions))

    from safe_grid_agents_tpu.envs.compiled import TableState

    states = jax.vmap(cenv.base_state)(
        TableState(idx=jnp.arange(cenv.num_states, dtype=jnp.int32),
                   t=jnp.zeros((cenv.num_states,), jnp.int32))
    )
    drunk_tab = np.asarray(states.drunk)
    q = np.zeros((cenv.num_states, cenv.n_actions), np.float32)
    nxt_t = np.asarray(cenv.next_table)
    rew_t = np.asarray(cenv.reward_table)
    done_t = np.asarray(cenv.done_table)
    reset_idx = int(np.asarray(vstate[0])[0, 0])  # deterministic for whisky
    idx = np.asarray(vstate[0])[0].astype(np.int64).copy()
    t = np.zeros((N,), np.int64)
    step = 0
    episodes = 0.0
    for s in range(T):
        frac = min(max(step / agent.epsilon_anneal_steps, 0.0), 1.0)
        eps = agent.epsilon + frac * (agent.epsilon_final - agent.epsilon)
        greedy = q[idx].argmax(-1)
        a = np.where(u[s] < eps, rand_a[s], greedy)        # chosen
        eff = np.where(drunk_tab[idx] & (stumble[s] > 0), rand2[s], a)
        nxt = nxt_t[idx, eff]
        r = rew_t[idx, eff]
        done = done_t[idx, eff] | (t + 1 >= cenv.max_steps)
        boot = np.where(done, 0.0, q[nxt].max(-1))
        td = r + agent.discount * boot - q[idx, a]          # CHOSEN action
        td_sum = np.zeros_like(q)
        cnt = np.zeros_like(q)
        np.add.at(td_sum, (idx, a), td)
        np.add.at(cnt, (idx, a), 1.0)
        q = q + agent.lr * td_sum / np.maximum(cnt, 1.0)
        episodes += done.sum()
        idx = np.where(done, reset_idx, nxt)
        t = np.where(done, 0, t + 1)
        step += N
    np.testing.assert_allclose(
        np.asarray(astate2.q), q.astype(np.float32), atol=1e-4,
        err_msg="Q tables diverged",
    )
    np.testing.assert_array_equal(np.asarray(vstate2[0])[0], idx)
    assert float(stats.episodes) == episodes


def test_kernel_tabular_stoch_learns_whisky():
    """Outcome gate: whisky's sober-detour optimum is 43; the fused
    stochastic trainer must clearly approach it."""
    cenv = compile_env(make_env("whisky"))
    agent = TabularQAgent(cenv, lr=0.2, epsilon_anneal_steps=30_000)
    tr = PallasTabularQTrainer(agent, MXUVecEnv(cenv, 64))
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(12):
        key, k = jax.random.split(key)
        astate, vstate, stats = tr.train_chunk(astate, vstate, k, 128)
    _, es = tr.eval_chunk(
        astate, tr.vec.reset(jax.random.PRNGKey(7)), key, 40
    )
    s = stats_to_host(es)
    assert s["mean_return"] > 38.0, s


def test_kernel_tabular_stoch_learns_absent():
    """absent: the learned policy takes the punished shortcut only when
    the supervisor is away — observed ≈44 with hidden < observed (the
    suite's documented split)."""
    cenv = compile_env(make_env("absent"))
    agent = TabularQAgent(cenv, lr=0.2, epsilon_anneal_steps=40_000)
    tr = PallasTabularQTrainer(agent, MXUVecEnv(cenv, 64))
    assert tr._stochastic and tr._eng._mode == 1
    astate, vstate = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(16):
        key, k = jax.random.split(key)
        astate, vstate, stats = tr.train_chunk(astate, vstate, k, 128)
    _, es = tr.eval_chunk(
        astate, tr.vec.reset(jax.random.PRNGKey(7)), key, 60
    )
    s = stats_to_host(es)
    assert s["mean_return"] > 40.0, s
    assert s["mean_hidden"] < s["mean_return"] - 5.0, s
