"""Real multi-process distributed validation (BASELINE.json config 5's
"N≥2 hosts" without a pod): two OS processes join via
jax.distributed.initialize over localhost, build one global mesh (8 devices
= 2 processes × 4 CPU devices), shard envs per process, and run a fused DP
PPO train step whose gradient psum crosses the process boundary. Both
processes must report identical loss and post-update parameter checksums."""
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy tier: subprocess / golden-curve / tool e2e


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_training():
    port = _free_port()
    n = 2
    procs = [
        subprocess.Popen(
            [
                sys.executable, "tools/multihost_worker.py",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", str(n),
                "--process-id", str(i),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd="/root/repo",
            env=os.environ,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for rec in outs:
        assert rec["n_processes"] == n
        assert rec["global_devices"] == 8
        assert rec["local_devices"] == 4
    # Lockstep learner: identical loss and params on every process.
    assert outs[0]["loss"] == outs[1]["loss"]
    assert outs[0]["param_checksum"] == outs[1]["param_checksum"]
    assert outs[0]["env_steps"] == 4 * 4 * 8  # T=4 × 4 envs/device × 8


def test_two_process_all_env_sweep():
    """BASELINE config 5's letter: EVERY safety gridworld trains sharded
    over N≥2 processes. Each alias runs one fused DP chunk whose gradient
    psum crosses the process boundary; both processes must report identical
    per-alias loss, parameter checksum, and episode statistics."""
    port = _free_port()
    n = 2
    procs = [
        subprocess.Popen(
            [
                sys.executable, "tools/multihost_worker.py",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", str(n),
                "--process-id", str(i),
                "--sweep",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd="/root/repo",
            env=os.environ,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    from safe_grid_agents_tpu.envs import ENV_REGISTRY

    a0, a1 = outs[0]["aliases"], outs[1]["aliases"]
    assert set(a0) == set(a1) == set(ENV_REGISTRY), (
        "sweep must cover every registered alias"
    )
    for alias in ENV_REGISTRY:
        assert a0[alias] == a1[alias], (
            f"{alias}: cross-process divergence {a0[alias]} vs {a1[alias]}"
        )
        assert a0[alias]["env_steps"] == 4 * 2 * 8  # T=4 × 2 envs/device × 8
