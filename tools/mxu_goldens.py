"""MXU tabular-trainer suite goldens (VERDICT r2 #9).

The MXU tabular trainer's matmul TD accumulates float sums in a different
association than the scatter path; on stochastic-index envs (tomato) that
legitimately shifts the learned trajectory (RESULTS.md cross-engine note).
To catch UNINTENDED drift in the matmul TD — rather than re-measuring
prose — this pins a short-budget deterministic run per MXU-eligible alias:

    python tools/mxu_goldens.py --update   # regenerate tests/goldens/mxu_suite.json
    python tools/mxu_goldens.py            # print current vs goldens

tests/test_mxu_goldens.py re-runs the suite on the CPU backend (same as CI)
and asserts each alias's (return, hidden) within tolerance. friend/foe/
neutral are excluded (the MXU engine rejects their state-dependent resets);
sokoban2 is excluded on cost (a [N, 175616] one-hot per step).
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

GOLDEN_PATH = "tests/goldens/mxu_suite.json"

ALIASES = [
    "shift", "shift-test", "island", "sokoban", "boat", "tomato",
    "tomato-crmdp", "whisky", "absent", "interrupt", "conveyor",
    "conveyor-sushi", "corners", "way", "toy",
]

N_ENVS = 64
CHUNK = 128
N_CHUNKS = 6          # 49,152 env steps — deterministic short budget
EVAL_STEPS = 150


def run_alias(alias: str, seed: int = 0):
    """Deterministic short MXU-tabular run; returns final greedy eval."""
    import jax.numpy as jnp  # noqa: F401

    from safe_grid_agents_tpu.agents.tabular import TabularQAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.common import stats_to_host
    from safe_grid_agents_tpu.training.tabular_mxu import MXUTabularQTrainer

    cenv = make_env(alias, compiled=True)
    agent = TabularQAgent(
        cenv, lr=0.2, epsilon_anneal_steps=20_000, epsilon_final=0.03
    )
    tr = MXUTabularQTrainer(agent, MXUVecEnv(cenv, N_ENVS))
    astate, mstate = tr.init(jax.random.PRNGKey(seed))
    chunk = jax.jit(tr.train_chunk, static_argnums=3)
    key = jax.random.PRNGKey(seed + 1)
    for _ in range(N_CHUNKS):
        key, k = jax.random.split(key)
        astate, mstate, _ = chunk(astate, mstate, k, CHUNK)
    _, es = jax.jit(tr.eval_chunk, static_argnums=3)(
        astate, tr.vec.reset(jax.random.PRNGKey(7)), key, EVAL_STEPS
    )
    s = stats_to_host(es)
    return {"return": round(s["mean_return"], 3),
            "hidden": round(s["mean_hidden"], 3)}


def main():
    update = "--update" in sys.argv
    results = {}
    for alias in ALIASES:
        results[alias] = run_alias(alias)
        print(alias, results[alias], flush=True)
    if update:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}")
    else:
        with open(GOLDEN_PATH) as f:
            stored = json.load(f)
        for alias, got in results.items():
            print(alias, "golden", stored.get(alias), "current", got)


if __name__ == "__main__":
    main()
