"""Headline benchmark: env-steps/s/chip on 4096-way vectorized shift.

BASELINE.md target: >= 5,000,000 env-steps/s/chip at 4096 lockstep instances
of distributional_shift under jit (north-star config 2). Prints exactly ONE
JSON line on stdout for the driver; secondary numbers go to stderr.

Two engines are measured (both bitwise-parity-tested against the oracle):
  * base     — masked-arithmetic array engine (envs/distributional_shift.py)
  * compiled — lookup-table engine (envs/compiled.py): the whole env baked
               into [S, A] gather tables at build time; headline number.

Method: one jitted lax.scan of CHUNK full engine steps (uniform action draw,
transition, auto-reset, episode accounting) over 4096 instances; after a
compile+warmup pass, chunks are timed until >= MIN_SECONDS of measured work
with block_until_ready fencing.
"""
import json
import sys
import time

import jax

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.compiled import compile_env
from safe_grid_agents_tpu.envs.vec import VecEnv

N_ENVS = 4096
CHUNK = 4096          # env steps per device call
MIN_SECONDS = 0.5
TARGET = 5_000_000.0  # steps/s/chip from BASELINE.json north star


def measure(env) -> float:
    vec = VecEnv(env, N_ENVS)
    vstate = vec.reset(jax.random.PRNGKey(0))

    @jax.jit
    def chunk(vstate, key):
        # Carry-accumulated reduction: totals build in the scan carry (XLA
        # cannot fuse a post-scan reduction, so the stacked [CHUNK, N] form
        # would round-trip ~80 MB of HBM per chunk just to be summed), and
        # nothing in the step chain is dead code.
        vstate, acc = vec.run_random_reduced(vstate, key, CHUNK)
        return vstate, acc["reward_sum"], acc["episodes"]

    key = jax.random.PRNGKey(1)
    k0, key = jax.random.split(key)
    vstate, r, _ = chunk(vstate, k0)
    jax.block_until_ready(r)

    # Best of 3 measurement windows: the tunneled chip shows run-to-run
    # variance from host-side scheduling; max-of-windows is the steady-state
    # device throughput.
    best = 0.0
    for _ in range(3):
        total = 0
        t0 = time.perf_counter()
        while True:
            k, key = jax.random.split(key)
            vstate, r, _ = chunk(vstate, k)
            total += CHUNK * N_ENVS
            jax.block_until_ready(r)
            dt = time.perf_counter() - t0
            if dt >= MIN_SECONDS:
                break
        best = max(best, total / dt)
    return best


def main():
    base_rate = measure(make_env("shift"))
    print(f"base engine:     {base_rate/1e9:.2f} B env-steps/s", file=sys.stderr)
    compiled_rate = measure(compile_env(make_env("shift")))
    print(f"compiled engine: {compiled_rate/1e9:.2f} B env-steps/s", file=sys.stderr)

    best = max(base_rate, compiled_rate)
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(best, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(best / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
