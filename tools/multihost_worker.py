"""Multi-process worker for the N≥2-host validation (BASELINE.json config 5
without a pod: JAX's distributed runtime over localhost, CPU devices).

Launched once per "host" by tests/test_multihost.py:

    SGA_PLATFORM=cpu python tools/multihost_worker.py \
        --coordinator 127.0.0.1:<port> --num-processes 2 --process-id <i>

Each process contributes 4 local CPU devices; the global mesh spans all
processes, env shards are process-local, and gradient psum crosses the
process boundary — the same code path a TPU pod slice runs over ICI/DCN.
Prints one JSON line with the per-process view for the test to assert.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--sweep", action="store_true",
                    help="train EVERY env alias for one short chunk under "
                         "cross-process psum (BASELINE config 5's letter: "
                         "'all safety gridworlds sharded over N>=2 hosts') "
                         "and emit one JSON object keyed by alias")
    args = ap.parse_args()

    from safe_grid_agents_tpu.parallel.multihost import ensure_initialized

    ensure_initialized(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes

    import numpy as np

    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.vec import VecEnv
    from safe_grid_agents_tpu.parallel import DPTrainer, make_mesh
    from safe_grid_agents_tpu.training.ppo import PPOTrainer

    n_global = len(jax.devices())  # all processes' devices
    mesh = make_mesh(n_data=n_global)

    if args.sweep:
        # Every gridworld alias trains one fused DP chunk with its gradient
        # psum crossing the process boundary; the test asserts the per-alias
        # loss/checksum/stats agree bitwise across processes (lockstep
        # learner). PPO is the universal family (no state-enumeration
        # requirement), kept tiny: 2 envs/device, 4-step chunk.
        from safe_grid_agents_tpu.envs import ENV_REGISTRY

        report = {}
        for alias in sorted(ENV_REGISTRY):
            env = make_env(alias)
            vec = VecEnv(env, 2 * n_global)
            agent = PPOAgent(env, hidden=(16, 16), epochs=2, n_minibatches=2)
            trainer = DPTrainer(PPOTrainer(agent, vec), mesh)
            astate, vstate = trainer.init(jax.random.PRNGKey(0))
            chunk = jax.jit(trainer.train_chunk, static_argnums=3)
            astate, vstate, stats, loss = chunk(
                astate, vstate, jax.random.PRNGKey(1), 4
            )
            leaves = jax.tree.leaves(astate.params)
            checksum = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
            report[alias] = {
                "loss": round(float(loss), 6),
                "param_checksum": round(checksum, 4),
                "env_steps": float(stats.env_steps),
                "episodes": float(stats.episodes),
                "return_sum": round(float(stats.return_sum), 4),
                "hidden_sum": round(float(stats.hidden_sum), 4),
            }
        print(json.dumps({
            "process": jax.process_index(),
            "n_processes": jax.process_count(),
            "global_devices": n_global,
            "aliases": report,
        }), flush=True)
        return
    env = make_env("shift")
    vec = VecEnv(env, 4 * n_global)
    agent = PPOAgent(env, hidden=(32, 32), epochs=2, n_minibatches=2)
    trainer = DPTrainer(PPOTrainer(agent, vec), mesh)

    astate, vstate = trainer.init(jax.random.PRNGKey(0))
    chunk = jax.jit(trainer.train_chunk, static_argnums=3)
    astate, vstate, stats, loss = chunk(astate, vstate, jax.random.PRNGKey(1), 4)

    # Params stay replicated across processes after the psum-ed update: dump
    # a param checksum every process must agree on.
    leaves = jax.tree.leaves(astate.params)
    checksum = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
    print(
        json.dumps(
            {
                "process": jax.process_index(),
                "n_processes": jax.process_count(),
                "global_devices": n_global,
                "local_devices": jax.local_device_count(),
                "loss": round(float(loss), 6),
                "param_checksum": round(checksum, 4),
                "env_steps": float(stats.env_steps),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
