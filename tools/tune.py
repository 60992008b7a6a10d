"""ASHA-style successive-halving hyperparameter tuner (reference Ray Tune
hook, SURVEY.md §2a #13 / §5 — the reference wrapped its train loop as a Tune
trainable; this is the TPU-native analogue, with early stopping built on the
framework's own checkpoint/resume machinery instead of a Tune scheduler).

Random-samples N configs, trains every config for a rung budget, keeps the
top 1/eta by eval mean_return, and *resumes the survivors from their own
checkpoints* for the next (eta× longer) rung — promotion costs only the
incremental steps, exactly like ASHA's rungs.

    python tools/tune.py island ppo-mlp --samples 8 --rungs 3 --eta 2 \
        --rung-steps 20000 --space lr=1e-4,3e-4,1e-3 --space clipping=0.1,0.2 \
        [base CLI flags...]

``--space flag=v1,v2,...`` declares a categorical sampling dimension (values
drawn uniformly). Continuous ranges use ``--space flag=log:lo:hi`` (log-
uniform float). Results stream as JSONL; the final line is the winner.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

if os.environ.get("SGA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SGA_PLATFORM"])

from safe_grid_agents_tpu.cli.main import run  # noqa: E402


def parse_space(specs):
    """[('lr', 'log:1e-4:1e-2'), ...] → {name: sampler()}"""
    space = {}
    for name, _, spec in (s.partition("=") for s in specs):
        if spec.startswith("log:"):
            _, lo, hi = spec.split(":")
            lo, hi = float(lo), float(hi)
            space[name] = lambda rng, lo=lo, hi=hi: float(
                math.exp(rng.uniform(math.log(lo), math.log(hi)))
            )
        else:
            vals = spec.split(",")
            space[name] = lambda rng, vals=vals: rng.choice(vals)
    return space


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("env")
    ap.add_argument("agent")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--rungs", type=int, default=3)
    ap.add_argument("--eta", type=int, default=2, help="keep top 1/eta per rung")
    ap.add_argument("--rung-steps", type=int, default=20_000,
                    help="env steps of the first rung (each rung is eta× longer)")
    ap.add_argument("--space", action="append", default=[],
                    help="flag=v1,v2,... or flag=log:lo:hi")
    ap.add_argument("--tune-seed", type=int, default=0)
    ap.add_argument("--final-gate", type=int, default=0, metavar="K",
                    help="after the rung loop, resume the top-K configs of "
                         "the LAST rung to --final-steps and pick the "
                         "winner by THAT eval. Round-5 fix for the rung-"
                         "gating bias the shift ppo-cnn sweep exposed "
                         "(RESULTS.md): rung returns favor pre-collapse "
                         "peaks; the final gate scores at (and past) the "
                         "real budget horizon.")
    ap.add_argument("--final-steps", type=int, default=None,
                    help="budget for the --final-gate runs (default: one "
                         "eta-rung beyond the last rung)")
    ap.add_argument("--work-dir", type=str, default=None,
                    help="checkpoint root (default: temp dir, cleaned up)")
    args, passthrough = ap.parse_known_args(argv)
    if not args.space:
        ap.error("need at least one --space dimension")

    rng = random.Random(args.tune_seed)
    space = parse_space(args.space)
    configs = [
        {name: sample(rng) for name, sample in space.items()}
        for _ in range(args.samples)
    ]

    work = args.work_dir or tempfile.mkdtemp(prefix="sga_tune_")
    cleanup = args.work_dir is None
    try:
        alive = list(range(len(configs)))
        latest = {}  # cfg index → most recent rung score
        for rung in range(args.rungs):
            steps = args.rung_steps * (args.eta ** rung)
            scores = []
            for i in alive:
                extra = []
                for name, val in configs[i].items():
                    extra += [f"--{name}", str(val)]
                ckpt_dir = os.path.join(work, f"cfg{i}")
                stats = run(
                    [args.env, args.agent, "--steps", str(steps),
                     "--checkpoint-dir", ckpt_dir, "--resume"]
                    + passthrough + extra
                )
                score = stats.get("mean_return", float("-inf"))
                if score != score:  # NaN (e.g. zero eval episodes) → worst
                    score = float("-inf")
                scores.append((score, i))
                latest[i] = score
                print(json.dumps({"rung": rung, "steps": steps, "cfg": i,
                                  **configs[i],
                                  **{k: round(v, 3) for k, v in stats.items()}}),
                      flush=True)
            # Promote the top 1/eta (ties broken by config index).
            scores.sort(key=lambda t: (-t[0], t[1]))
            keep = max(1, len(alive) // args.eta)
            alive = [i for _, i in scores[:keep]]
            if len(alive) == 1 and rung < args.rungs - 1:
                # Single survivor: finish its budget in the remaining rungs.
                continue
        if args.final_gate:
            # Final gate: the top-K configs by LATEST score — which
            # resurrects rung losers (the mispromotion case: a config
            # killed at a short horizon can win at the real budget) — each
            # resumed from its own checkpoint to the final budget and
            # scored by the eval AT that horizon, not a rung peak.
            pool = sorted(latest.items(), key=lambda kv: (-kv[1], kv[0]))
            finalists = [i for i, _ in pool[: args.final_gate]]
            final_steps = args.final_steps or (
                args.rung_steps * (args.eta ** args.rungs)
            )
            fscores = []
            for i in finalists:
                extra = []
                for name, val in configs[i].items():
                    extra += [f"--{name}", str(val)]
                stats = run(
                    [args.env, args.agent, "--steps", str(final_steps),
                     "--checkpoint-dir", os.path.join(work, f"cfg{i}"),
                     "--resume"] + passthrough + extra
                )
                score = stats.get("mean_return", float("-inf"))
                if score != score:
                    score = float("-inf")
                fscores.append((score, i))
                print(json.dumps({"rung": "final", "steps": final_steps,
                                  "cfg": i, **configs[i],
                                  **{k: round(v, 3)
                                     for k, v in stats.items()}}),
                      flush=True)
            fscores.sort(key=lambda t: (-t[0], t[1]))
            best = fscores[0][1]
        else:
            best = alive[0]
        print(json.dumps({"winner": best, **configs[best]}), flush=True)
        return configs[best]
    finally:
        if cleanup:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
