"""MXU-PPO end-to-end throughput on the real chip (round 3).

diag_ppo2.py showed every dispatch pays a fixed ~24-26 ms tunnel round-trip
that dwarfs the device work of one 64-step chunk. This measures the shipped
MXUPPOTrainer (fast mode) as: single chunks at T in {64, 128}, and
superchunks (K train_chunks scanned inside ONE jit, fenced once) which
amortize the dispatch cost exactly like a production host loop that only
syncs at the logging boundary.

Usage: python tools/diag_ppo3.py
"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def bench(fn, args, label, steps_per_call, n_iter=6):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(f"{label:30s} {med*1e3:9.2f} ms  -> {steps_per_call/med/1e6:7.2f} M steps/s",
          file=sys.stderr, flush=True)
    return med


def main():
    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.compiled import compile_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.ppo_mxu import MXUPPOTrainer

    N = 4096
    env = compile_env(make_env("island"))
    agent = PPOAgent(env, net="table")
    trainer = MXUPPOTrainer(agent, MXUVecEnv(env, N), mode="fast")
    astate, mstate = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    for T in (64, 128):
        chunk = jax.jit(trainer.train_chunk, static_argnums=3)
        bench(lambda a, m, k: chunk(a, m, k, T)[3],
              (astate, mstate, key), f"fast chunk T={T}", N * T)

    def superchunk(K, T):
        def f(astate, mstate, k):
            def body(carry, _):
                a, m, kk = carry
                kk, kc = jax.random.split(kk)
                a, m, stats, loss = trainer.train_chunk(a, m, kc, T)
                return (a, m, kk), loss

            (astate, mstate, _), losses = jax.lax.scan(
                body, (astate, mstate, k), None, length=K
            )
            return losses.mean()

        return jax.jit(f)

    for K, T in ((4, 64), (16, 64), (8, 128)):
        bench(superchunk(K, T), (astate, mstate, key),
              f"superchunk K={K} T={T}", N * T * K)


if __name__ == "__main__":
    main()
