"""Seed / hyperparameter sweep driver (replaces the reference's Ray Tune
hook, SURVEY.md §2a #13 / §5: a simple sweep suffices for parity).

Grid-sweeps any CLI flags over values and reports final eval stats per run:

    python tools/sweep.py shift tabular-q --steps 60000 \
        --sweep seed=0,1,2 --sweep lr=0.1,0.2

Each run reuses the in-process CLI (`cli.main.run`), so compiled programs
are cached across runs that share shapes.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, ".")

# Env vars like JAX_PLATFORMS are consumed before user code in this
# environment (see CLAUDE.md); SGA_PLATFORM provides an escape hatch.
if os.environ.get("SGA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SGA_PLATFORM"])

from safe_grid_agents_tpu.cli.main import run  # noqa: E402


def main():
    argv = sys.argv[1:]
    sweeps = []
    passthrough = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sweep":
            name, _, vals = argv[i + 1].partition("=")
            sweeps.append((name, vals.split(",")))
            i += 2
        else:
            passthrough.append(argv[i])
            i += 1
    if not sweeps:
        print("usage: sweep.py <cli args> --sweep flag=v1,v2 [--sweep ...]")
        sys.exit(2)

    names = [n for n, _ in sweeps]
    results = []
    for combo in itertools.product(*[v for _, v in sweeps]):
        extra = []
        for n, v in zip(names, combo):
            extra += [f"--{n}", v]
        stats = run(passthrough + extra)
        # NaN means "no finished eval episodes" (training/common.py): emit
        # strict-JSON null and rank such combos worst (NaN would poison the
        # max() comparison chain).
        rec = {
            **dict(zip(names, combo)),
            **{k: (None if v != v else round(v, 3)) for k, v in stats.items()},
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    def score(r):
        v = r.get("mean_return")
        return float("-inf") if v is None else v

    best = max(results, key=score)
    print("best by mean_return:", json.dumps(best))


if __name__ == "__main__":
    main()
