"""Headline benchmark: env-steps/s/chip on 4096-way vectorized shift.

BASELINE.md target: >= 5,000,000 env-steps/s/chip at 4096 lockstep instances
of distributional_shift under jit (north-star config 2). Prints exactly one
JSON line for the driver.

Method: one jitted lax.scan of CHUNK random-action steps over the vectorized
engine (uniform action draws included — this is the full engine loop a random
warmup would run, including auto-reset and episode accounting). Timed over
several chunks after a compile+warmup pass, with block_until_ready fencing.
"""
import json
import time

import jax
import jax.numpy as jnp

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.vec import VecEnv

N_ENVS = 4096
CHUNK = 1024          # env steps per device call
REPEATS = 5
TARGET = 5_000_000.0  # steps/s/chip from BASELINE.json north star


def main():
    env = make_env("shift")
    vec = VecEnv(env, N_ENVS)
    key = jax.random.PRNGKey(0)
    vstate = vec.reset(key)

    @jax.jit
    def chunk(vstate, key):
        vstate, outs = vec.run_random(vstate, key, CHUNK)
        # Reduce outputs on-device so we don't time a host transfer of
        # [CHUNK, N] arrays; return scalars to keep the work honest (XLA
        # cannot dead-code-eliminate the env step chain).
        return vstate, outs.reward.sum(), outs.done.sum()

    # Compile + warmup.
    k0, key = jax.random.split(key)
    vstate, r, d = chunk(vstate, k0)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    total = 0
    for _ in range(REPEATS):
        k, key = jax.random.split(key)
        vstate, r, d = chunk(vstate, k)
        total += CHUNK * N_ENVS
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps_per_sec = total / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
