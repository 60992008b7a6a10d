"""MXU-PPO lane-width scan (round 3, after the K/T scan in diag_ppo3).

The shipped geometry (N=4096, T=64) leaves the optimize phase latency-bound:
~1.3 ms of per-update kernel-boundary floor against ~0.3 ms of matmul at
mb=16 384.  Widening the lane count N grows every minibatch (mb = N*T/16)
without adding updates, so the launch floor amortizes — until the fwd/bwd
goes HBM/matmul-bound.  This sweeps N at fixed T and superchunk K and
reports env-steps/s per geometry so PERF.md can state where the knee is.

Usage: python tools/diag_ppo4.py [--t 64] [--k 8]
"""
import argparse
import statistics
import sys
import time

import jax


def bench(fn, args, label, steps_per_call, n_iter=5):
    out = fn(*args)
    float(out.reshape(-1)[0])
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out.reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    rate = steps_per_call / med / 1e6
    print(f"{label:28s} {med*1e3:9.2f} ms  -> {rate:8.2f} M steps/s",
          file=sys.stderr, flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--lanes", type=int, nargs="*",
                    default=[4096, 8192, 16384, 32768])
    args = ap.parse_args()

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
              f"N={N} T={T} K={K} mb={N*T//16}", N * T * K)


if __name__ == "__main__":
    main()
