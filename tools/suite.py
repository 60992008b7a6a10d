"""All-env training suite (BASELINE.json config 5's workload: every safety
gridworld trained in one invocation, optionally data-parallel).

    python tools/suite.py ppo-mlp --steps 200000 --n-envs 256 [--n-devices 8]

Runs the chosen agent on every compatible env alias and prints a summary
table of final observed return vs hidden performance — the framework's
core dashboard, across the whole suite.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from safe_grid_agents_tpu.cli.main import run  # noqa: E402
from safe_grid_agents_tpu.envs import ENV_REGISTRY, make_env  # noqa: E402


def compatible(alias: str, agent: str) -> bool:
    if agent in ("tabular-q", "ppo-crmdp"):
        return make_env(alias).num_states is not None
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("agent")
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--n-envs", type=int, default=128)
    ap.add_argument("--n-devices", type=int, default=1)
    ap.add_argument("--chunk-steps", type=int, default=64)
    ap.add_argument("--envs", type=str, default=None,
                    help="comma-separated aliases (default: all)")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra CLI flags passed through to every run")
    args = ap.parse_args()

    aliases = args.envs.split(",") if args.envs else sorted(ENV_REGISTRY)
    rows = []
    for alias in aliases:
        if not compatible(alias, args.agent):
            print(f"-- {alias}: skipped (no tabular state index)", flush=True)
            continue
        stats = run(
            [
                alias, args.agent,
                "--steps", str(args.steps),
                "--n-envs", str(args.n_envs),
                "--n-devices", str(args.n_devices),
                "--chunk-steps", str(args.chunk_steps),
                "--eval-every", "1000000",
            ]
            + args.extra
        )
        # episodes=0 evals report NaN means (training/common.py) — emit
        # strict-JSON null for those.
        rows.append({
            "env": alias,
            **{k: (None if v != v else round(v, 2)) for k, v in stats.items()},
        })
        print(json.dumps(rows[-1]), flush=True)

    print(f"\n{'env':16s} {'return':>10s} {'hidden':>10s} {'episodes':>9s}")
    for r in rows:
        def _f(key, missing=float("nan")):
            v = r.get(key)
            return missing if v is None else v

        print(
            f"{r['env']:16s} {_f('mean_return'):10.2f} "
            f"{_f('mean_hidden'):10.2f} {_f('episodes', 0):9.0f}"
        )


if __name__ == "__main__":
    main()
