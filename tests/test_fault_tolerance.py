"""Fault injection / elastic recovery (SURVEY.md §5 "Failure detection /
elastic recovery / fault injection" — absent in the reference; required for
the production runtime).

Scenario: a real training process is SIGKILLed mid-run — possibly mid
async-checkpoint-write, leaving a torn step directory — then relaunched with
``--resume``. The relaunch must (a) recover from the newest *readable*
checkpoint (``restore_latest_valid`` skips torn ones), and (b) finish the run
**bitwise identical** to a never-interrupted twin: the checkpoint pytree
carries agent state + env states + RNG keys, and the chunk loop is
deterministic from any chunk boundary, so preemption is unobservable in the
final state. Runs real OS processes on the CPU backend (``--platform cpu``).

Two legs (VERDICT r3 missing #3): the base tabular path, and the MXU-PPO
fast path whose checkpoint carries novel state (flat-vector opt_state,
MXUState with per-lane keys).
"""
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

pytestmark = pytest.mark.slow  # heavy tier: subprocess / golden-curve / tool e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name → (argv minus --steps/--checkpoint-dir, n_chunks, kill_at_step,
#         steps_per_chunk)
CONFIGS = {
    "tabular": (
        ["shift", "tabular-q",
         "--n-envs", "1024", "--chunk-steps", "64",
         "--eval-every", "100000", "--eval-steps", "8",
         "--lr", "0.2", "--seed", "7",
         "--checkpoint-every", "20"],
        400, 100, 64 * 1024,
    ),
    # MXU-PPO fast path: tile-shuffled optimize + flat-param adam; the
    # checkpoint's opt_state is a flat vector and vstate is an MXUState.
    "ppo-mxu": (
        ["corners", "ppo-mlp", "--compiled", "--mxu", "--table-net",
         "--n-envs", "256", "--chunk-steps", "16",
         "--eval-every", "100000", "--eval-steps", "8",
         "--lr", "0.001", "--seed", "7",
         "--checkpoint-every", "10"],
        300, 60, 16 * 256,
    ),
}


def _args(name, ckpt_dir):
    argv, n_chunks, _, steps_per_chunk = CONFIGS[name]
    # tabular leg: ~40 ms/chunk on CPU → ~16 s of chunk time: a wide kill
    # window. ppo-mxu: ~30 ms/chunk → ~9 s.
    return [
        sys.executable, "-m", "safe_grid_agents_tpu", *argv,
        "--platform", "cpu",
        "--steps", str(n_chunks * steps_per_chunk),
        "--checkpoint-dir", str(ckpt_dir),
    ]


def _final_state(ckpt_dir, n_chunks):
    """Raw final-checkpoint pytree (no example structure needed)."""
    path = os.path.join(str(ckpt_dir), str(n_chunks), "default")
    assert os.path.isdir(path), f"missing final checkpoint {path}"
    return ocp.StandardCheckpointer().restore(path)


def _committed_steps(ckpt_dir):
    try:
        return sorted(
            int(d) for d in os.listdir(ckpt_dir)
            if d.isdigit() and not os.path.exists(
                os.path.join(ckpt_dir, d, "_CHECKPOINT_METADATA.orbax-partial")
            )
        )
    except FileNotFoundError:
        return []


@pytest.mark.parametrize("config", list(CONFIGS))
def test_sigkill_resume_bitwise(tmp_path, config):
    _, n_chunks, kill_at, _ = CONFIGS[config]
    dir_a = tmp_path / "uninterrupted"
    dir_b = tmp_path / "preempted"
    env = {**os.environ, "PYTHONUNBUFFERED": "1"}

    # Twin A: straight through.
    subprocess.run(_args(config, dir_a), cwd=REPO, env=env, check=True,
                   capture_output=True, timeout=300)

    # Twin B: SIGKILL mid-run (no cleanup, async saves torn at random).
    proc = subprocess.Popen(_args(config, dir_b), cwd=REPO, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            steps = _committed_steps(dir_b)
            if steps and steps[-1] >= kill_at:
                break
            if proc.poll() is not None:
                pytest.fail(
                    "run finished before the kill window:\n"
                    + proc.stdout.read().decode()
                )
            time.sleep(0.02)
        assert proc.poll() is None
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    killed_at = _committed_steps(dir_b)[-1]
    assert kill_at <= killed_at < n_chunks

    # Relaunch with --resume: must pick a readable checkpoint and finish.
    out = subprocess.run(_args(config, dir_b) + ["--resume"], cwd=REPO,
                         env=env, check=True, capture_output=True, timeout=300)
    assert b"resumed from chunk" in out.stdout

    # Preemption must be unobservable: final checkpoints bitwise equal
    # (agent + opt state, env states, RNG key chain — every leaf).
    state_a = _final_state(dir_a, n_chunks)
    state_b = _final_state(dir_b, n_chunks)
    leaves_a, treedef_a = jax.tree.flatten(state_a)
    leaves_b, treedef_b = jax.tree.flatten(state_b)
    assert treedef_a == treedef_b
    assert leaves_a, "empty checkpoint"
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
