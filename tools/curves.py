"""Learning-curve capture + regression goldens (SURVEY.md §4 item 3:
trainer learning curves must stay within the seed-variance band of stored
references).

    python tools/curves.py --update     # regenerate tests/goldens/curves.json
    python tools/curves.py              # print current curves vs goldens

The regression test (tests/test_curves.py) re-runs the cheap configs and
asserts each seed's curve stays within the stored band ± tolerance.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

if __name__ == "__main__":
    # Goldens MUST come from the CPU backend (matching tests/conftest.py) —
    # env vars are consumed before user code here (CLAUDE.md), so force it.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

GOLDEN_PATH = "tests/goldens/curves.json"

# (name, env, agent, agent_kwargs, trainer_kwargs, n_envs, chunk_steps,
#  n_chunks, eval_every, eval_steps)
CONFIGS = [
    dict(
        name="tabq_shift",
        env="shift",
        agent="tabular-q",
        agent_kwargs={"lr": 0.2, "epsilon_anneal_steps": 20_000},
        n_envs=64,
        chunk_steps=128,
        n_chunks=12,
        eval_every=3,
        eval_steps=30,
    ),
    dict(
        name="dqn_sokoban",
        env="sokoban",
        agent="deep-q",
        agent_kwargs={
            "lr": 5e-4,
            "epsilon_anneal_steps": 60_000,
            "batch_size": 128,
            "replay_capacity": 50_000,
            "sync_every": 100,
        },
        n_envs=128,
        chunk_steps=32,
        n_chunks=20,
        eval_every=4,
        eval_steps=120,
        warmup=40,
    ),
    dict(
        name="ppo_corners",
        env="corners",
        agent="ppo-mlp",
        agent_kwargs={"lr": 1e-3, "entropy_bonus": 0.05},
        n_envs=64,
        chunk_steps=16,
        n_chunks=60,
        eval_every=15,
        eval_steps=25,
    ),
]


def collect_curve(cfg: dict, seed: int):
    from safe_grid_agents_tpu.agents import make_agent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.vec import VecEnv
    from safe_grid_agents_tpu.training import make_trainer, stats_to_host

    env = make_env(cfg["env"])
    vec = VecEnv(env, cfg["n_envs"])
    agent = make_agent(cfg["agent"], env, **cfg.get("agent_kwargs", {}))
    trainer = make_trainer(cfg["agent"], agent, vec)
    astate, vstate = trainer.init(jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 1)
    if cfg.get("warmup"):
        key, kw = jax.random.split(key)
        astate, vstate, _ = jax.jit(trainer.warmup_chunk, static_argnums=3)(
            astate, vstate, kw, cfg["warmup"]
        )
    chunk = jax.jit(trainer.train_chunk, static_argnums=3)
    echunk = jax.jit(trainer.eval_chunk, static_argnums=3)
    jreset = jax.jit(vec.reset)
    curve = []
    for i in range(cfg["n_chunks"]):
        key, k = jax.random.split(key)
        out = chunk(astate, vstate, k, cfg["chunk_steps"])
        astate, vstate = out[0], out[1]
        if (i + 1) % cfg["eval_every"] == 0:
            _, es = echunk(astate, jreset(jax.random.PRNGKey(7)), k, cfg["eval_steps"])
            s = stats_to_host(es)
            # A zero-episode eval reports NaN means (training/common.py); a
            # golden curve must never bake NaN in (every tolerance compare
            # would then fail opaquely) — fail loudly at collection instead.
            assert s["episodes"] > 0, (
                f"{cfg['name']} seed {seed}: no eval episodes finished at "
                f"chunk {i + 1} — raise eval_steps for this config"
            )
            curve.append({"return": round(s["mean_return"], 3),
                          "hidden": round(s["mean_hidden"], 3)})
    return curve


def main():
    update = "--update" in sys.argv
    seeds = [0, 1, 2]
    out = {}
    for cfg in CONFIGS:
        out[cfg["name"]] = {
            str(seed): collect_curve(cfg, seed) for seed in seeds
        }
        print(cfg["name"], json.dumps(out[cfg["name"]]["0"]), flush=True)
    if update:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
