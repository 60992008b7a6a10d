"""Headline benchmark: env-steps/s/chip on 4096-way vectorized shift.

BASELINE.md target: >= 5,000,000 env-steps/s/chip at 4096 lockstep instances
of distributional_shift under jit (north-star config 2). Prints exactly ONE
JSON line on stdout for the driver; secondary numbers go to stderr.

Three engines are measured (all bitwise-parity-tested against the oracle):
  * base     — masked-arithmetic array engine (envs/distributional_shift.py)
  * compiled — lookup-table engine (envs/compiled.py): gather pipeline
  * mxu      — fused one-hot-matmul rollout over the compiled tables
               (envs/mxu.py): the headline engine

Methodology — hardened twice after round 1:
  1. FENCING. On the axon platform ``jax.block_until_ready`` is an async
     acknowledgement, NOT a completion fence — round 1's numbers measured
     the enqueue rate (~0.37 ms/dispatch regardless of 256x work changes)
     and overstated real throughput by up to 1000x. Every timed dispatch
     here ends in a scalar ``device_get`` (float()), which cannot return
     before the device produced the value.
  2. WINDOWS. Per engine: compile + warmup dispatches, then N_WINDOWS
     independent windows of >= WINDOW_SECONDS of fenced work; the statistic
     is the MEDIAN window. If windows spread more than MAX_SPREAD the round
     is considered contended and re-measured (up to MAX_ROUNDS); the
     reported value is the best round's median (contention only lowers
     throughput, so the highest stable median is the steady state).
  3. The tunnel round-trip is ~29 ms; chunk sizes are set so one dispatch
     is >= 100 ms of device work. Do not run another TPU process
     concurrently (single chip — contention is detected, not avoided).
"""
import json
import os
import statistics
import sys
import time

import jax

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.compiled import compile_env
from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
from safe_grid_agents_tpu.envs.vec import VecEnv

N_ENVS = 4096
WINDOW_SECONDS = 1.0  # minimum fenced device work per window
N_WINDOWS = 3
MAX_ROUNDS = 3
MAX_SPREAD = 0.25     # (max/min - 1) within a round before we call it contended
TARGET = 5_000_000.0  # steps/s/chip from BASELINE.json north star


def _warn_if_contended():
    """Best-effort check for other live TPU-using processes from this repo."""

    def _ancestors(pid: int) -> set:
        out = set()
        while pid > 1:
            out.add(pid)
            try:
                with open(f"/proc/{pid}/stat") as f:
                    pid = int(f.read().rsplit(")", 1)[1].split()[1])
            except (OSError, IndexError, ValueError):
                break
        return out

    try:
        skip = _ancestors(os.getpid())
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) in skip:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().decode(errors="replace").replace("\0", " ")
            except OSError:
                continue
            if "python" in cmd and any(
                s in cmd for s in ("bench", "safe_grid_agents_tpu", "tools/suite", "tools/fuzz")
            ):
                print(
                    f"WARNING: possible concurrent TPU process pid={pid}: {cmd.strip()}"
                    " — single chip; expect contended (low) readings.",
                    file=sys.stderr,
                )
    except OSError:
        pass


def _measure_fn(step_chunk, steps_per_chunk: int, label: str):
    """step_chunk(state, key) -> (state, scalar).

    Returns (median, band_low, band_high): the best round's median window
    plus the min/max over EVERY window of EVERY round — the run-to-run
    variance the single headline number would otherwise hide (VERDICT r2
    weak #1; PERF.md documents a 0.96–1.5 B band across invocations)."""
    key = jax.random.PRNGKey(1)
    state = None
    # Compile + warm the tunnel; every call fenced by a real host transfer.
    for _ in range(2):
        k0, key = jax.random.split(key)
        state, scalar = step_chunk(state, k0)
        float(scalar)

    best_median = 0.0
    all_windows = []
    for rnd in range(MAX_ROUNDS):
        windows = []
        for _ in range(N_WINDOWS):
            total = 0
            t0 = time.perf_counter()
            while True:
                k, key = jax.random.split(key)
                state, scalar = step_chunk(state, k)
                float(scalar)  # device_get: the only real fence on axon
                total += steps_per_chunk
                dt = time.perf_counter() - t0
                if dt >= WINDOW_SECONDS:
                    break
            windows.append(total / dt)
        all_windows += windows
        med = statistics.median(windows)
        spread = max(windows) / min(windows) - 1.0
        print(
            f"{label} round {rnd}: median {med/1e6:.1f} M  "
            f"[{min(windows)/1e6:.1f}, {max(windows)/1e6:.1f}] M  "
            f"spread {spread*100:.0f}%",
            file=sys.stderr,
        )
        best_median = max(best_median, med)
        if spread <= MAX_SPREAD:
            break
        print(f"{label}: window spread > {MAX_SPREAD*100:.0f}% — re-measuring "
              "(tunnel/host contention suspected)", file=sys.stderr)
    return best_median, min(all_windows), max(all_windows)


def measure_vecenv(env, label: str, chunk: int, n_envs: int = N_ENVS):
    vec = VecEnv(env, n_envs)
    vstate0 = vec.reset(jax.random.PRNGKey(0))

    @jax.jit
    def chunk_fn(vstate, key):
        # Carry-accumulated reduction: totals build in the scan carry (the
        # stacked [CHUNK, N] form would round-trip the outputs through HBM
        # just to be summed); nothing in the step chain is dead code.
        vstate, acc = vec.run_random_reduced(vstate, key, chunk)
        return vstate, acc["reward_sum"]

    def step(state, key):
        return chunk_fn(vstate0 if state is None else state, key)

    return _measure_fn(step, chunk * n_envs, label)


def measure_mxu(cenv, label: str, chunk: int, n_envs: int = N_ENVS):
    mxu = MXUVecEnv(cenv, n_envs)
    mstate0 = mxu.reset(jax.random.PRNGKey(0))

    @jax.jit
    def chunk_fn(mstate, key):
        mstate, acc = mxu.run_random_reduced(mstate, key, chunk)
        return mstate, acc["reward_sum"]

    def step(state, key):
        return chunk_fn(mstate0 if state is None else state, key)

    return _measure_fn(step, chunk * n_envs, label)


def measure_pallas(cenv, label: str, chunk: int, n_envs: int = N_ENVS):
    """Round-4 fused rollout kernel (ops/rollout_kernel.py): the whole
    T-step scan inside one pallas kernel, same action-draw protocol and
    bitwise-parity-tested vs the XLA engines (tests/test_rollout_kernel.py)."""
    from safe_grid_agents_tpu.ops.rollout_kernel import PallasRolloutEngine

    ker = PallasRolloutEngine(cenv, n_envs)
    ks0 = ker.reset()

    @jax.jit
    def chunk_fn(state, key):
        state, acc = ker.run_random_reduced(state, key, chunk)
        return state, acc["reward_sum"]

    def step(state, key):
        return chunk_fn(ks0 if state is None else state, key)

    return _measure_fn(step, chunk * n_envs, label)


def main():
    _warn_if_contended()
    cenv = compile_env(make_env("shift"))

    # Real per-chunk rates (device_get-fenced): base ~23 M, compiled ~32 M,
    # mxu ~1.5+ B steps/s. Chunks sized so one dispatch is ≥ ~300 ms of
    # device work: the tunnel round-trip is a fixed ~26 ms per dispatch
    # (PERF.md round-3 decomposition), so 100 ms dispatches under-reported
    # the device rate by up to ~25%.
    base_rate, _, _ = measure_vecenv(make_env("shift"), "base", 8192)
    print(f"base engine:     {base_rate/1e6:.1f} M env-steps/s", file=sys.stderr)
    compiled_rate, _, _ = measure_vecenv(cenv, "compiled", 8192)
    print(f"compiled engine: {compiled_rate/1e6:.1f} M env-steps/s", file=sys.stderr)
    mxu_rate, mxu_lo, mxu_hi = measure_mxu(cenv, "mxu", 131072)
    print(f"mxu engine:      {mxu_rate/1e6:.1f} M env-steps/s "
          f"[{mxu_lo/1e6:.1f}, {mxu_hi/1e6:.1f}]", file=sys.stderr)
    # Round-4 headline engine: the fused pallas rollout kernel — the whole
    # T-step scan in one kernel, bitwise-parity-tested vs the XLA engines.
    pal_rate, pal_lo, pal_hi = measure_pallas(cenv, "pallas", 131072)
    print(f"pallas kernel:   {pal_rate/1e6:.1f} M env-steps/s "
          f"[{pal_lo/1e6:.1f}, {pal_hi/1e6:.1f}]", file=sys.stderr)
    # Secondary: both fast engines keep scaling with lockstep width past the
    # north-star 4096 (PERF.md width table) — report the 65k-lane point so
    # the headline's conscious 4096 choice doesn't hide it. Measured with
    # whichever engine won the 4096-lane headline, so both JSON numbers come
    # from ONE engine (and the field is labeled regardless).
    if pal_rate >= mxu_rate:
        wide_rate, _, _ = measure_pallas(
            cenv, "pallas-65k", 16384, n_envs=65536
        )
        wide_label = "pallas"
    else:
        wide_rate, _, _ = measure_mxu(cenv, "mxu-65k", 16384, n_envs=65536)
        wide_label = "mxu"
    print(f"{wide_label} @65k:     {wide_rate/1e6:.1f} M env-steps/s",
          file=sys.stderr)

    best = max(base_rate, compiled_rate, mxu_rate, pal_rate)
    if pal_rate >= mxu_rate:
        mxu_lo, mxu_hi = pal_lo, pal_hi  # band follows the winning engine
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(best, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(best / TARGET, 3),
                # Run-to-run band of the headline engine (all fenced windows
                # this invocation; cross-invocation band is wider — PERF.md).
                "band": [round(mxu_lo, 1), round(mxu_hi, 1)],
                # 65,536-lane secondary config (same engine, wider lockstep).
                "at_65536_lanes": round(wide_rate, 1),
                "n_envs": N_ENVS,
                "engine": "pallas-fused-rollout"
                if pal_rate >= mxu_rate
                else "xla-mxu",
            }
        )
    )


if __name__ == "__main__":
    main()
