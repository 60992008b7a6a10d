"""Consolidated on-chip diagnostics (round 4; merges diag_ppo{,2,3,4}.py).

Every timed dispatch is fenced by a scalar device_get (CLAUDE.md: on the
axon platform ``block_until_ready`` is an async ACK, not a completion
fence), reported as the median of >=5 calls. Subcommands:

  ppo-decomp      PPO chunk phase walls: collect, permutation, gathers,
                  fwd+bwd, adam (was tools/diag_ppo.py)
  ppo-candidates  candidate optimize layouts: unroll, env-slice, flat adam
                  (was tools/diag_ppo2.py)
  ppo-e2e         shipped MXUPPOTrainer end-to-end: single chunks +
                  superchunks (was tools/diag_ppo3.py)
  ppo-lanes       MXU-PPO lane-width scan (was tools/diag_ppo4.py)
  dqn-decomp      DQN-MXU chunk decomposition + candidate fast paths
                  (round-4 VERDICT #3)
  engine-carry    one-hot-carry engine variant vs the shipped one-hot
                  construct engine (round-4 VERDICT #4)
  engine-pallas   fused pallas rollout kernel vs the XLA MXU engine
                  (round 4; ops/rollout_kernel.py)
  ppo-kernel-opt  fused PPO optimize kernel vs the XLA fast optimize,
                  collect excluded (round 5; ops/ppo_kernel.py)
  engine-stoch    stochastic rollout kernel vs the XLA MXU engine on
                  absent/interrupt/whisky/friend (round 5;
                  ops/stoch_rollout_kernel.py)

Usage: python tools/diag.py <subcommand> [flags]
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, args, label, n_iter=6, steps_per_call=None):
    """Median fenced wall-clock of ``fn(*args)`` (compile excluded)."""
    out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    rate = ""
    if steps_per_call:
        rate = f"  -> {steps_per_call/med/1e6:8.2f} M steps/s"
    print(f"{label:34s} {med*1e3:9.2f} ms  (min {min(times)*1e3:.2f}){rate}",
          file=sys.stderr, flush=True)
    return med


# --------------------------------------------------------------------------
# ppo-decomp (was diag_ppo.py)
# --------------------------------------------------------------------------
def ppo_decomp(args):
    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import TableState, compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.envs.vec import VecEnv
    from safe_grid_agents_tpu.training.ppo import PPOTrainer

    N, T = args.n_envs, args.t
    B = N * T
    env = compile_env(make_env("island"))
    agent = PPOAgent(env, net="table")
    vec = VecEnv(env, N)
    mxu = MXUVecEnv(env, N)
    trainer = PPOTrainer(agent, vec)
    key = jax.random.PRNGKey(0)
    astate, vstate = trainer.init(key)

    chunk = jax.jit(trainer.train_chunk, static_argnums=3)
    t_full = bench(lambda a, v, k: chunk(a, v, k, T)[2].episodes,
                   (astate, vstate, key), "chunk/full", steps_per_call=B)

    col = jax.jit(lambda a, v, k: trainer.collect(a, v, k, T)[2].episodes)
    bench(col, (astate, vstate, key), "collect/vec")

    mstate = mxu.reset(jax.random.PRNGKey(1))

    def mxu_collect(astate, mstate, k):
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            pre = TableState(idx=st.idx, t=st.t)
            action, logp, value = agent.sample_action(astate.params, pre, ka)
            st, out = mxu.step(st, action)
            return (st, kk), (out["reward"], logp)

        (st, _), ys = jax.lax.scan(body, (mstate, k), None, length=T)
        return ys[0].sum()

    bench(jax.jit(mxu_collect), (astate, mstate, key), "collect/mxu")

    k1, k2, k3 = jax.random.split(key, 3)
    flat = {
        "states": TableState(
            idx=jax.random.randint(k1, (B,), 0, env.num_states),
            t=jnp.zeros((B,), jnp.int32),
        ),
        "actions": jax.random.randint(k2, (B,), 0, env.n_actions),
        "old_logp": jnp.full((B,), -1.38, jnp.float32),
        "advantages": jax.random.normal(k3, (B,)),
        "returns": jnp.asarray(jax.random.normal(k1, (B,))),
    }

    opt_full = jax.jit(lambda a, f, k: trainer.optimize(a, f, k, B)[2])
    t_opt = bench(opt_full, (astate, flat, key), "opt/full")
    n_updates = agent.epochs * agent.n_minibatches
    print(f"  -> {t_opt*1e3/n_updates:.2f} ms/minibatch-update",
          file=sys.stderr)

    mb_size = B // agent.n_minibatches
    mb0 = jax.tree.map(lambda x: x[:mb_size], flat)

    def opt_fixed(astate, mb, k):
        def upd(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(agent.loss)(params, mb)
            updates, opt_state = agent.tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            upd, (astate.params, astate.opt_state), None, length=n_updates
        )
        return losses.mean()

    bench(jax.jit(opt_fixed), (astate, mb0, key), "opt/fixed-minibatch")

    def opt_gradonly(astate, mb, k):
        def upd(s, _):
            loss, _ = jax.value_and_grad(agent.loss)(astate.params, mb)
            return s + loss, None

        s, _ = jax.lax.scan(upd, jnp.float32(0.0), None, length=n_updates)
        return s

    bench(jax.jit(opt_gradonly), (astate, mb0, key), "opt/gradonly")

    def perm_only(k):
        def epoch(s, _):
            k2 = jax.random.fold_in(k, s.astype(jnp.int32))
            perm = jax.random.permutation(k2, B)
            return s + perm[0].astype(jnp.float32), None

        s, _ = jax.lax.scan(epoch, jnp.float32(0.0), None, length=agent.epochs)
        return s

    bench(jax.jit(perm_only), (key,), "perm only")

    def gather_only(flat, k):
        perm = jax.random.permutation(k, B)

        def mb(s, i):
            take = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
            g = jax.tree.map(lambda x: x[take], flat)
            return s + g["advantages"].sum(), None

        s, _ = jax.lax.scan(
            mb, jnp.float32(0.0), jnp.arange(n_updates) % agent.n_minibatches
        )
        return s

    bench(jax.jit(gather_only), (flat, key), "gather only")


# --------------------------------------------------------------------------
# ppo-candidates (was diag_ppo2.py)
# --------------------------------------------------------------------------
def ppo_candidates(args):
    from jax.flatten_util import ravel_pytree

    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import TableState, compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv

    N = args.n_envs
    env = compile_env(make_env("island"))
    agent = PPOAgent(env, net="table")
    mxu = MXUVecEnv(env, N)
    key = jax.random.PRNGKey(0)
    astate = agent.init(key)
    mstate = mxu.reset(jax.random.PRNGKey(1))

    def make_collect(T, unroll):
        def collect(astate, mstate, k):
            def body(carry, _):
                st, kk = carry
                kk, ka = jax.random.split(kk)
                pre = TableState(idx=st.idx, t=st.t)
                action, logp, _ = agent.sample_action(astate.params, pre, ka)
                st, out = mxu.step(st, action)
                return (st, kk), (out["reward"], logp)

            (st, _), ys = jax.lax.scan(
                body, (mstate, k), None, length=T, unroll=unroll
            )
            return ys[0].sum()

        return jax.jit(collect)

    for unroll in (1, 4):
        bench(make_collect(64, unroll), (astate, mstate, key),
              f"collect T=64 unroll={unroll}")

    n_mb = agent.n_minibatches

    def make_flat(T):
        B = N * T
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "states": TableState(
                idx=jax.random.randint(k1, (B,), 0, env.num_states),
                t=jnp.zeros((B,), jnp.int32),
            ),
            "actions": jax.random.randint(k2, (B,), 0, env.n_actions),
            "old_logp": jnp.full((B,), -1.38, jnp.float32),
            "advantages": jax.random.normal(k3, (B,)),
            "returns": jnp.asarray(jax.random.normal(k1, (B,))),
        }

    def make_envslice(T, unroll, flat_params):
        B = N * T
        mb_size = B // n_mb

        if flat_params:
            _, unravel = ravel_pytree(astate.params)
            tx = agent.tx

            def opt(astate, flat, k):
                flat_p = ravel_pytree(astate.params)[0]
                opt_state = tx.init(flat_p)

                def epoch(carry, _):
                    p, s = carry

                    def minibatch(carry, i):
                        p, s = carry
                        mb = jax.tree.map(
                            lambda x: jax.lax.dynamic_slice_in_dim(
                                x, i * mb_size, mb_size
                            ),
                            flat,
                        )
                        loss, g = jax.value_and_grad(
                            lambda fp: agent.loss(unravel(fp), mb)
                        )(p)
                        upd, s = tx.update(g, s, p)
                        return (p + upd, s), loss

                    (p, s), losses = jax.lax.scan(
                        minibatch, (p, s), jnp.arange(n_mb), unroll=unroll
                    )
                    return (p, s), losses.mean()

                (p, _), losses = jax.lax.scan(
                    epoch, (flat_p, opt_state), None, length=agent.epochs
                )
                return losses.mean()

            return jax.jit(opt)

        def opt(astate, flat, k):
            def epoch(carry, _):
                params, opt_state = carry

                def minibatch(carry, i):
                    params, opt_state = carry
                    mb = jax.tree.map(
                        lambda x: jax.lax.dynamic_slice_in_dim(
                            x, i * mb_size, mb_size
                        ),
                        flat,
                    )
                    loss, grads = jax.value_and_grad(agent.loss)(params, mb)
                    updates, opt_state = agent.tx.update(
                        grads, opt_state, params
                    )
                    params = jax.tree.map(
                        lambda p, u: p + u, params, updates
                    )
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    minibatch, (params, opt_state), jnp.arange(n_mb),
                    unroll=unroll,
                )
                return (params, opt_state), losses.mean()

            (params, _), losses = jax.lax.scan(
                epoch, (astate.params, astate.opt_state), None,
                length=agent.epochs,
            )
            return losses.mean()

        return jax.jit(opt)

    flat64 = make_flat(64)
    bench(make_envslice(64, 1, False), (astate, flat64, key),
          "opt T=64 envslice")
    bench(make_envslice(64, 4, True), (astate, flat64, key),
          "opt T=64 envslice flat u=4")
    flat128 = make_flat(128)
    bench(make_envslice(128, 4, True), (astate, flat128, key),
          "opt T=128 envslice flat u=4")


# --------------------------------------------------------------------------
# ppo-e2e (was diag_ppo3.py)
# --------------------------------------------------------------------------
def ppo_e2e(args):
    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.ppo_mxu import MXUPPOTrainer

    N = args.n_envs
    env = compile_env(make_env("island"))
    agent = PPOAgent(env, net="table")
    trainer = MXUPPOTrainer(agent, MXUVecEnv(env, N), mode="fast")
    astate, mstate = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    for T in (64, 128):
        chunk = jax.jit(trainer.train_chunk, static_argnums=3)
        bench(lambda a, m, k: chunk(a, m, k, T)[3],
              (astate, mstate, key), f"fast chunk T={T}",
              steps_per_call=N * T)

    def superchunk(K, T):
        def f(astate, mstate, k):
            def body(carry, _):
                a, m, kk = carry
                kk, kc = jax.random.split(kk)
                a, m, stats, loss = trainer.train_chunk(a, m, kc, T)
                return (a, m, kk), loss

            (astate, mstate, _), losses = jax.lax.scan(
                body, (astate, mstate, key), None, length=K
            )
            return losses.mean()

        return jax.jit(f)

    for K, T in ((4, 64), (16, 64), (8, 128)):
        bench(superchunk(K, T), (astate, mstate, key),
              f"superchunk K={K} T={T}", steps_per_call=N * T * K)


# --------------------------------------------------------------------------
# ppo-lanes (was diag_ppo4.py)
# --------------------------------------------------------------------------
def ppo_lanes(args):
    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.ppo_mxu import MXUPPOTrainer

    env = compile_env(make_env("island"))
    T, K = args.t, args.k

    for N in args.lanes:
        agent = PPOAgent(env, net="table")
        trainer = MXUPPOTrainer(agent, MXUVecEnv(env, N), mode="fast")
        astate, mstate = trainer.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)

        def f(astate, mstate, k):
            def body(carry, _):
                a, m, kk = carry
                kk, kc = jax.random.split(kk)
                a, m, stats, loss = trainer.train_chunk(a, m, kc, T)
                return (a, m, kk), loss

            (_, _, _), losses = jax.lax.scan(
                body, (astate, mstate, k), None, length=K)
            return losses.mean()

        bench(jax.jit(f), (astate, mstate, key),
              f"N={N} T={T} K={K} mb={N*T//16}", steps_per_call=N * T * K)


# --------------------------------------------------------------------------
# dqn-decomp (round 4, VERDICT #3): where do the 13 M amortized go?
# --------------------------------------------------------------------------
def dqn_decomp(args):
    from safe_grid_agents_tpu.agents.dqn import DQNAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.dqn_mxu import MXUDQNTrainer

    N, T = args.n_envs, args.t
    U = max(1, T // 8)  # bench_train geometry: one update per 8 steps
    env = make_env("sokoban", compiled=True)
    agent = DQNAgent(env, replay_capacity=1 << 20, batch_size=1024)
    trainer = MXUDQNTrainer(agent, MXUVecEnv(env, N), updates_per_chunk=U)
    astate, mstate = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    astate, mstate, _ = jax.jit(trainer.warmup_chunk, static_argnums=3)(
        astate, mstate, key, 16
    )

    chunk = jax.jit(trainer.train_chunk, static_argnums=3)
    bench(lambda a, m, k: chunk(a, m, k, T)[3],
          (astate, mstate, key), f"chunk/full T={T} U={U}",
          steps_per_call=N * T)

    # collect phase alone (act_explore + MXU step + replay push)
    col = jax.jit(
        lambda a, m, k: trainer._collect(a, m, k, T, False)[3].episodes
    )
    bench(col, (astate, mstate, key),
          f"collect+push T={T}", steps_per_call=N * T)

    # collect without the replay push (act + env step only)
    def col_nopush(astate, mstate, k):
        def body(carry, _):
            st, kk = carry
            kk, ka = jax.random.split(kk)
            from safe_grid_agents_tpu.envs.compiled import TableState

            pre = TableState(idx=st.idx, t=st.t)
            actions = agent.act_explore(astate, pre, ka)
            st, out = trainer.vec.step(st, actions)
            return (st, kk), out["reward"].sum()

        (_, _), r = jax.lax.scan(body, (mstate, k), None, length=T)
        return r.sum()

    bench(jax.jit(col_nopush), (astate, mstate, key), f"collect/nopush T={T}")

    # update phase alone — BASE path (pytree adam, DQNAgent.update) vs the
    # shipped flat scan
    astate_base = astate.replace(opt_state=agent.tx.init(astate.params))

    def upd_only(astate, k):
        def body(carry, _):
            a, kk = carry
            kk, ku = jax.random.split(kk)
            a, loss = agent.update(a, ku)
            return (a, kk), loss

        (_, _), losses = jax.lax.scan(body, (astate, k), None, length=U)
        return losses.mean()

    t_upd = bench(jax.jit(upd_only), (astate_base, key),
                  f"updates U={U} (base pytree)")
    print(f"  -> {t_upd*1e3/U:.2f} ms/update", file=sys.stderr)

    upd_flat = jax.jit(
        lambda a, k: trainer._update_scan(a, k, U)[1]
    )
    t_updf = bench(upd_flat, (astate, key), f"updates U={U} (flat shipped)")
    print(f"  -> {t_updf*1e3/U:.2f} ms/update", file=sys.stderr)

    # update sub-phases on one sampled batch
    from safe_grid_agents_tpu.utils import replay

    batch = replay.sample(astate.buffer, key, agent.batch_size)

    def sample_only(astate, k):
        def body(s, i):
            b = replay.sample(astate.buffer, jax.random.fold_in(k, i),
                              agent.batch_size)
            return s + b.reward.sum(), None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(U))
        return s

    bench(jax.jit(sample_only), (astate, key), f"sample only xU")

    def fwdbwd_only(astate, b):
        def body(s, _):
            loss, _ = jax.value_and_grad(agent.td_loss)(
                astate.params, astate.target_params, b
            )
            return s + loss, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=U)
        return s

    bench(jax.jit(fwdbwd_only), (astate, batch), "td fwd+bwd only xU")

    def adam_only(astate, b):
        loss, grads = jax.value_and_grad(agent.td_loss)(
            astate.params, astate.target_params, b
        )

        def body(carry, _):
            params, opt_state = carry
            updates, opt_state = agent.tx.update(grads, opt_state, params)
            import optax

            return (optax.apply_updates(params, updates), opt_state), None

        (p, _), _ = jax.lax.scan(
            body, (astate.params, astate.opt_state), None, length=U
        )
        return jax.tree.leaves(p)[0].sum()

    bench(jax.jit(adam_only), (astate_base, batch), "adam only xU (pytree)")

    # unroll ablation on the shipped (flat) chunk
    for unroll in (1, 4):
        tr2 = MXUDQNTrainer(agent, trainer.vec, updates_per_chunk=U,
                            unroll=unroll)
        c2 = jax.jit(tr2.train_chunk, static_argnums=3)
        bench(lambda a, m, k: c2(a, m, k, T)[3], (astate, mstate, key),
              f"chunk/flat unroll={unroll}", steps_per_call=N * T)

    # superchunk amortization
    def superchunk(K, tr):
        c = tr.train_chunk

        def f(astate, mstate, k):
            def body(carry, _):
                a, m, kk = carry
                kk, kc = jax.random.split(kk)
                a, m, stats, loss = c(a, m, kc, T)
                return (a, m, kk), loss

            (_, _, _), losses = jax.lax.scan(
                body, (astate, mstate, k), None, length=K
            )
            return losses.mean()

        return jax.jit(f)

    for K in (8,):
        bench(superchunk(K, trainer), (astate, mstate, key),
              f"superchunk K={K} (flat, unroll=4)",
              steps_per_call=N * T * K)


# --------------------------------------------------------------------------
# engine-carry (round 4, VERDICT #4): carry the one-hot row as the state
# --------------------------------------------------------------------------
def engine_carry(args):
    """Candidate headline engine: state = one-hot row oh [N, S] advanced by
    per-action permutation matmuls (oh' = oh @ P_a — exact 0/1 in bf16),
    eliminating the per-step one_hot(idx, S) construct that PERF.md's MFU
    section names as the binding VPU roof. Reset = basis-row select.
    Compares against the shipped construct-engine at identical fencing and
    dispatch sizing. Deterministic-reset envs only (the headline config)."""
    import numpy as np

    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv

    env = compile_env(make_env("shift"))
    S, A = env.num_states, env.n_actions

    # Packed payload: per action a, P_a [S, S] one-step permutation
    # (next_idx scatter) plus reward/done columns → W [S, A*(S+2)].
    F = S + 2
    W = np.zeros((S, A * F), np.float32)
    for a in range(A):
        P = np.zeros((S, S), np.float32)
        P[np.arange(S), env.next_table[:, a]] = 1.0
        W[:, a * F : a * F + S] = P
        W[:, a * F + S] = env.reward_table[:, a]
        W[:, a * F + S + 1] = env.done_table[:, a].astype(np.float32)
    # rewards are small integers -> representable; indices never appear as
    # VALUES here (only as positions), so bf16 stays exact end-to-end.
    bf_ok = np.array_equal(W.astype(jnp.bfloat16).astype(np.float32), W)
    dtype = jnp.bfloat16 if bf_ok else jnp.float32
    Wd = jnp.asarray(W, dtype)
    max_steps = int(env.max_steps)

    for N in args.lanes:
        mxu = MXUVecEnv(env, N)  # shipped engine baseline

        # ----- shipped engine (one-hot construct) -----
        st0 = mxu.reset(jax.random.PRNGKey(0))
        T = args.t

        runner = jax.jit(mxu.run_random_reduced, static_argnums=2)
        bench(lambda s, k: runner(s, k, T)[1]["reward_sum"],
              (st0, jax.random.PRNGKey(1)), f"construct N={N}",
              n_iter=5, steps_per_call=N * T)

        # ----- carry engine -----
        oh0 = jnp.zeros((N, S), dtype).at[:, mxu.reset_idx].set(1)
        e_reset = jnp.zeros((S,), dtype).at[mxu.reset_idx].set(1)
        t0 = jnp.zeros((N,), jnp.int32)

        def carry_run(oh, t, key):
            actions = jax.random.randint(key, (T, N), 0, A)

            def body(carry, a_row):
                oh, t, acc = carry
                y = jax.lax.dot_general(
                    oh, Wd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(N, A, F)
                a_oh = jax.nn.one_hot(a_row, A, dtype=jnp.float32)
                f = (y * a_oh[:, :, None]).sum(axis=1)     # [N, F]
                nxt_oh = f[:, :S]                           # exact 0/1
                reward = f[:, S]
                done = (f[:, S + 1] > 0.5) | (t + 1 >= max_steps)
                oh = jnp.where(
                    done[:, None], e_reset[None, :], nxt_oh.astype(dtype)
                )
                t = jnp.where(done, 0, t + 1)
                acc = acc + reward.sum()
                return (oh, t, acc), None

            (oh, t, acc), _ = jax.lax.scan(
                body, (oh, t, jnp.float32(0.0)), actions
            )
            return acc

        bench(jax.jit(carry_run), (oh0, t0, jax.random.PRNGKey(1)),
              f"carry     N={N} (dtype={dtype.__name__})",
              n_iter=5, steps_per_call=N * T)


def engine_pallas(args):
    """Fused pallas rollout kernel vs the shipped XLA MXU engine, identical
    protocol (one presampled randint, reduced accumulators) and fencing."""
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.ops.rollout_kernel import PallasRolloutEngine

    env = compile_env(make_env("shift"))
    T = args.t

    for N in args.lanes:
        mxu = MXUVecEnv(env, N)
        st0 = mxu.reset(jax.random.PRNGKey(0))
        runner = jax.jit(mxu.run_random_reduced, static_argnums=2)
        bench(lambda s, k: runner(s, k, T)[1]["reward_sum"],
              (st0, jax.random.PRNGKey(1)), f"xla-mxu N={N}",
              n_iter=5, steps_per_call=N * T)

        ker = PallasRolloutEngine(env, N)
        ks0 = ker.reset()
        kr = jax.jit(ker.run_random_reduced, static_argnums=2)
        bench(lambda s, k: kr(s, k, T)[1]["reward_sum"],
              (ks0, jax.random.PRNGKey(1)), f"pallas  N={N}",
              n_iter=5, steps_per_call=N * T)


def engine_stoch(args):
    """Stochastic rollout kernel (ops/stoch_rollout_kernel.py) vs the XLA
    MXU engine on the stochastic aliases it covers (round 5, VERDICT #4):
    coin resets (absent/interrupt), carried resets (friend family), action
    noise (whisky), index drying (tomato — round-5 closing)."""
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.ops.stoch_rollout_kernel import (
        PallasStochRolloutEngine,
    )

    T = args.t
    for alias in args.aliases:
        env = (
            make_env(alias, compiled=True, cap=15)
            if alias in ("friend", "foe", "neutral")
            else compile_env(make_env(alias))
        )
        for N in args.lanes:
            mxu = MXUVecEnv(env, N)
            st0 = mxu.reset(jax.random.PRNGKey(0))
            runner = jax.jit(mxu.run_random_reduced, static_argnums=2)
            bench(lambda s, k: runner(s, k, T)[1]["reward_sum"],
                  (st0, jax.random.PRNGKey(1)),
                  f"{alias} xla-mxu N={N}", n_iter=5, steps_per_call=N * T)

            ker = PallasStochRolloutEngine(env, N)
            ks0 = ker.reset(jax.random.PRNGKey(0))
            kr = jax.jit(ker.run_random_reduced, static_argnums=2)
            bench(lambda s, k: kr(s, k, T)[1]["reward_sum"],
                  (ks0, jax.random.PRNGKey(1)),
                  f"{alias} kernel  N={N}", n_iter=5, steps_per_call=N * T)


def ppo_kernel_opt(args):
    """Optimize-phase wall: fused pallas kernel (ops/ppo_kernel.py) vs the
    XLA fast optimize, same flat rollout, same tile-shuffle membership
    (round 5, VERDICT #2). Collect is excluded — this isolates the
    ~1.3 ms/update kernel-boundary latency the kernel deletes."""
    import jax.numpy as jnp

    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import TableState
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.ppo_mxu import MXUPPOTrainer
    from safe_grid_agents_tpu.training.ppo_pallas import PallasPPOTrainer

    N, T = args.n_envs, args.t
    env = make_env("island", compiled=True)
    B = N * T
    key = jax.random.PRNGKey(3)
    flat = {
        "states": TableState(
            idx=jax.random.randint(key, (B,), 0, env.num_states),
            t=jnp.zeros((B,), jnp.int32),
        ),
        "actions": jax.random.randint(key, (B,), 0, env.n_actions),
        "old_logp": jnp.full((B,), -1.38),
        "advantages": jax.random.normal(key, (B,)),
        "returns": jax.random.normal(key, (B,)),
    }
    for cls, label in ((MXUPPOTrainer, "xla fast optimize"),
                       (PallasPPOTrainer, "fused kernel optimize")):
        agent = PPOAgent(env, net="table")
        tr = cls(agent, MXUVecEnv(env, N))
        astate, _ = tr.init(jax.random.PRNGKey(0))
        opt = jax.jit(
            lambda a, k: tr.optimize_fast(
                a, flat, k, B, entropy_coef=jnp.float32(0.01)
            )[2]
        )
        n_upd = agent.epochs * agent.n_minibatches
        bench(opt, (astate, jax.random.PRNGKey(1)),
              f"{label} ({n_upd} updates)", n_iter=6)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ppo-decomp")
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--t", type=int, default=64)
    p.set_defaults(fn=ppo_decomp)

    p = sub.add_parser("ppo-candidates")
    p.add_argument("--n-envs", type=int, default=4096)
    p.set_defaults(fn=ppo_candidates)

    p = sub.add_parser("ppo-e2e")
    p.add_argument("--n-envs", type=int, default=4096)
    p.set_defaults(fn=ppo_e2e)

    p = sub.add_parser("ppo-lanes")
    p.add_argument("--t", type=int, default=64)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--lanes", type=int, nargs="*",
                   default=[4096, 8192, 16384, 32768])
    p.set_defaults(fn=ppo_lanes)

    p = sub.add_parser("dqn-decomp")
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--t", type=int, default=256)
    p.set_defaults(fn=dqn_decomp)

    p = sub.add_parser("engine-carry")
    p.add_argument("--t", type=int, default=1024)
    p.add_argument("--lanes", type=int, nargs="*", default=[4096, 65536])
    p.set_defaults(fn=engine_carry)

    p = sub.add_parser("engine-pallas")
    p.add_argument("--t", type=int, default=16384)
    p.add_argument("--lanes", type=int, nargs="*", default=[4096])
    p.set_defaults(fn=engine_pallas)

    p = sub.add_parser("ppo-kernel-opt")
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--t", type=int, default=64)
    p.set_defaults(fn=ppo_kernel_opt)

    p = sub.add_parser("engine-stoch")
    p.add_argument("--t", type=int, default=16384)
    p.add_argument("--lanes", type=int, nargs="*", default=[4096])
    p.add_argument("--aliases", type=str, nargs="*",
                   default=["absent", "interrupt", "whisky", "friend",
                            "tomato"])
    p.set_defaults(fn=engine_stoch)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
