"""Round-3 MXU-PPO candidate optimizations, measured on the real chip.

diag_ppo.py located the walls: collect ~375 us/step (iteration overhead),
perm sort ~6 ms/epoch, minibatch gathers ~1.5 ms each, fwd+bwd ~1.9 ms and
adam+clip ~1.2 ms per update (all latency-bound, not FLOP-bound). Candidates:

  collect/unroll{2,4}   scan unrolling amortizes per-iteration overhead
  opt/envslice          minibatch = contiguous env block (transpose once,
                        zero gathers, zero perms)
  opt/envslice+flat     + optimizer over ravel_pytree-flattened params
  opt/envslice+unroll   + unrolled minibatch scan
  chunk sizes           T in {64, 128, 256} throughput projection

Usage: python tools/diag_ppo2.py
"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def bench(fn, args, label, n_iter=6):
    out = fn(*args)
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
    print(f"{label:26s} {med*1e3:9.2f} ms", file=sys.stderr, flush=True)
    return med


def main():
    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import TableState, compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv

    N = 4096
    env = compile_env(make_env("island"))
    agent = PPOAgent(env, net="table")
    mxu = MXUVecEnv(env, N)
    key = jax.random.PRNGKey(0)
    astate = agent.init(key)
    mstate = mxu.reset(jax.random.PRNGKey(1))

    # ---- collect with unrolling ----
    def make_collect(T, unroll):
        def collect(astate, mstate, k):
            def body(carry, _):
                st, kk = carry
                kk, ka = jax.random.split(kk)
                pre = TableState(idx=st.idx, t=st.t)
                action, logp, value = agent.sample_action(astate.params, pre, ka)
                st, out = mxu.step(st, action)
                return (st, kk), (out["reward"], logp)

            (st, _), ys = jax.lax.scan(
                body, (mstate, k), None, length=T, unroll=unroll
            )
            return ys[0].sum()

        return jax.jit(collect)

    for unroll in (1, 4):
        t = bench(make_collect(64, unroll), (astate, mstate, key),
                  f"collect T=64 unroll={unroll}")
    t128 = bench(make_collect(128, 4), (astate, mstate, key),
                 "collect T=128 unroll=4")
    t256 = bench(make_collect(256, 4), (astate, mstate, key),
                 "collect T=256 unroll=4")

    # ---- optimize variants ----
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
            "returns": jax.random.normal(k1, (B,)),
        }

    n_mb = agent.n_minibatches
    n_up = agent.epochs * n_mb

    def make_envslice(T, unroll, flat_params):
        B = N * T
        mb_size = B // n_mb

        if flat_params:
            p0, unravel = ravel_pytree(astate.params)
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
                    params = jax.tree.map(lambda p, u: p + u, params, updates)
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
    t_es = bench(make_envslice(64, 1, False), (astate, flat64, key),
                 "opt T=64 envslice")
    t_esfu = bench(make_envslice(64, 4, True), (astate, flat64, key),
                   "opt T=64 envslice flat u=4")

    flat128 = make_flat(128)
    t128o = bench(make_envslice(128, 4, True), (astate, flat128, key),
                  "opt T=128 envslice flat u=4")
    flat256 = make_flat(256)
    t256o = bench(make_envslice(256, 4, True), (astate, flat256, key),
                  "opt T=256 envslice flat u=4")

    # transpose cost ([T, N] -> env-major flat)
    def tr(x):
        return jnp.swapaxes(x.reshape(64, N), 0, 1).reshape(-1).sum()

    bench(jax.jit(lambda f: tr(f["advantages"])), (flat64,), "transpose [64,4096]")

    print("--- projections (collect + optimize) ---", file=sys.stderr)
    for T, tc, to in ((128, t128, t128o), (256, t256, t256o)):
        total = tc + to
        print(f"T={T}: {total*1e3:.1f} ms -> {N*T/total/1e6:.2f} M steps/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
