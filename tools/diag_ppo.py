"""PPO chunk cost decomposition on the real chip (round-3 MXU-PPO work).

Times each phase of the fused PPO chunk independently (device_get-fenced,
CLAUDE.md methodology) to locate the optimize-phase wall that keeps
ppo-table/island at ~2.4 M env-steps/s (PERF.md train table). Variants:

  collect/vec      collect T steps over VecEnv (shipped path)
  collect/mxu      collect T steps over MXUVecEnv (index-native)
  opt/full         shipped optimize: perm + per-minibatch gather
  opt/noperm       contiguous minibatch slices (no permutation, no gather)
  opt/fixed        same minibatch every update (no data motion at all)
  opt/gradonly     value_and_grad only, no optax update
  opt/bf16         shipped layout, bf16 params/compute in the loss

Usage: python tools/diag_ppo.py [--n-envs 4096] [--t 64]
"""
import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def bench(fn, args, label, n_iter=8):
    out = fn(*args)
    jax.tree.map(lambda x: None, out)
    # fence on one scalar leaf
    leaf = jax.tree.leaves(out)[0]
    float(leaf.reshape(-1)[0])
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(leaf.reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(f"{label:18s} {med*1e3:9.2f} ms  (min {min(times)*1e3:.2f})",
          file=sys.stderr, flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=4096)
    ap.add_argument("--t", type=int, default=64)
    args = ap.parse_args()

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

    # ---- full chunk (shipped) ----
    chunk = jax.jit(trainer.train_chunk, static_argnums=3)
    t_full = bench(lambda a, v, k: chunk(a, v, k, T)[2].episodes,
                   (astate, vstate, key), "chunk/full")
    print(f"  -> {B/t_full/1e6:.2f} M env-steps/s", file=sys.stderr)

    # ---- collect over VecEnv ----
    col = jax.jit(lambda a, v, k: trainer.collect(a, v, k, T)[2].episodes)
    bench(col, (astate, vstate, key), "collect/vec")

    # ---- collect over MXU env (index-native states) ----
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

    # ---- optimize variants over synthetic flat data ----
    k1, k2, k3 = jax.random.split(key, 3)
    flat = {
        "states": TableState(
            idx=jax.random.randint(k1, (B,), 0, env.num_states),
            t=jnp.zeros((B,), jnp.int32),
        ),
        "actions": jax.random.randint(k2, (B,), 0, env.n_actions),
        "old_logp": jnp.full((B,), -1.38, jnp.float32),
        "advantages": jax.random.normal(k3, (B,)),
        "returns": jax.random.normal(k1, (B,)),
    }

    opt_full = jax.jit(
        lambda a, f, k: trainer.optimize(a, f, k, B)[2]
    )
    t_opt = bench(opt_full, (astate, flat, key), "opt/full")
    n_updates = agent.epochs * agent.n_minibatches
    print(f"  -> {t_opt*1e3/n_updates:.2f} ms/minibatch-update",
          file=sys.stderr)

    mb_size = B // agent.n_minibatches

    def opt_noperm(astate, flat, k):
        def epoch(carry, _):
            params, opt_state = carry

            def minibatch(carry, mb_idx):
                params, opt_state = carry
                mb = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, mb_idx * mb_size, mb_size
                    ),
                    flat,
                )
                loss, grads = jax.value_and_grad(agent.loss)(params, mb)
                updates, opt_state = agent.tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(agent.n_minibatches)
            )
            return (params, opt_state), losses.mean()

        (params, _), losses = jax.lax.scan(
            epoch, (astate.params, astate.opt_state), None, length=agent.epochs
        )
        return losses.mean()

    bench(jax.jit(opt_noperm), (astate, flat, key), "opt/noperm")

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

    bench(jax.jit(opt_fixed), (astate, mb0, key), "opt/fixed")

    def opt_gradonly(astate, mb, k):
        def upd(s, _):
            loss, grads = jax.value_and_grad(agent.loss)(astate.params, mb)
            return s + loss, None

        s, _ = jax.lax.scan(upd, jnp.float32(0.0), None, length=n_updates)
        return s

    bench(jax.jit(opt_gradonly), (astate, mb0, key), "opt/gradonly")

    # permutation-only cost
    def perm_only(k):
        def epoch(s, _):
            k2 = jax.random.fold_in(k, s.astype(jnp.int32))
            perm = jax.random.permutation(k2, B)
            return s + perm[0].astype(jnp.float32), None

        s, _ = jax.lax.scan(epoch, jnp.float32(0.0), None, length=agent.epochs)
        return s

    bench(jax.jit(perm_only), (key,), "perm only")

    # gather-only cost: 16 gathers of mb_size from B over the 5 leaves
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


if __name__ == "__main__":
    main()
