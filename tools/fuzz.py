"""Long-horizon cross-engine fuzz: compiled vs array engine, bitwise, at
millions of steps per alias on the accelerator.

    python tools/fuzz.py [--steps 2000] [--n-envs 512]

Complements tests/test_compiled.py (short) and tests/test_native.py (C++,
deterministic aliases): this drives BOTH jax engines with identical keys —
including the stochastic-reset and noisy-action envs — and asserts bitwise
equality of rewards, hidden rewards, and dones over steps × n_envs
transitions per alias.
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from safe_grid_agents_tpu.envs import make_env  # noqa: E402
from safe_grid_agents_tpu.envs.compiled import COMPILEABLE  # noqa: E402
from safe_grid_agents_tpu.envs.vec import VecEnv  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n-envs", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    total = 0
    for alias in COMPILEABLE:
        base = make_env(alias)
        # make_env applies COMPILE_SUBSTITUTE (friend/foe/neutral lower to
        # the bounded-memory adversary) — compiling `base` directly would
        # build over the unbounded env's lossy pos-only index.
        comp = make_env(alias, compiled=True)
        steps = args.steps
        if hasattr(comp.base, "cap"):
            # Bitwise-equal window: one choice costs ≥4 steps (start→box
            # distance), so |d| ≤ steps/4 stays under the cap.
            steps = min(steps, 4 * comp.base.cap)
        vb, vc = VecEnv(base, args.n_envs), VecEnv(comp, args.n_envs)
        key = jax.random.PRNGKey(args.seed)
        sb, sc = vb.reset(key), vc.reset(key)
        acts = jax.random.randint(
            jax.random.PRNGKey(args.seed + 1),
            (steps, args.n_envs),
            0,
            base.n_actions,
        )
        _, ob = jax.jit(vb.run_actions)(sb, acts)
        _, oc = jax.jit(vc.run_actions)(sc, acts)
        for field in ("reward", "hidden_reward", "done"):
            a = np.asarray(getattr(ob, field))
            b = np.asarray(getattr(oc, field))
            if not np.array_equal(a, b):
                bad = np.argwhere(a != b)[0]
                raise SystemExit(
                    f"MISMATCH {alias}.{field} at (t, env)={tuple(bad)}: "
                    f"base {a[tuple(bad)]} compiled {b[tuple(bad)]}"
                )
        total += steps * args.n_envs
        print(f"{alias:16s} OK  ({steps * args.n_envs:,} transitions)", flush=True)
    print(f"all {len(COMPILEABLE)} aliases bitwise-identical over {total:,} transitions")


if __name__ == "__main__":
    main()
