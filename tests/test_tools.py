"""Tools & aux subsystems: profiler flag, sweep driver, multihost no-op."""
import json
import os
import subprocess
import sys

import jax
import pytest

from safe_grid_agents_tpu.cli.main import run
from safe_grid_agents_tpu.parallel.multihost import ensure_initialized, is_primary

pytestmark = pytest.mark.slow  # heavy tier: subprocess / golden-curve / tool e2e


def test_profile_writes_trace(tmp_path):
    trace = str(tmp_path / "trace")
    run(
        [
            "shift", "tabular-q",
            "--n-envs", "32", "--steps", "20000", "--chunk-steps", "128",
            "--eval-every", "100", "--eval-steps", "10",
            "--profile-dir", trace,
        ]
    )
    found = []
    for root, _, files in os.walk(trace):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found, "no profiler trace written"


def test_multihost_noop_single_process():
    ensure_initialized()  # no cluster env vars → must be a no-op
    assert is_primary()
    assert jax.process_count() == 1


def test_sweep_cli(tmp_path):
    out = subprocess.run(
        [
            sys.executable, "tools/sweep.py",
            "shift", "tabular-q",
            "--n-envs", "32", "--steps", "8192", "--chunk-steps", "128",
            "--eval-every", "100", "--eval-steps", "10",
            "--sweep", "seed=0,1",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
        env={**os.environ, "SGA_PLATFORM": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 2
    assert {json.loads(l)["seed"] for l in lines} == {"0", "1"}


def test_tune_asha_cli(tmp_path):
    # ASHA tuner (tools/tune.py): 3 sampled configs, 2 rungs, survivors
    # RESUME from their rung-1 checkpoints (Ray-Tune-hook parity, SURVEY.md
    # §2a #13).
    out = subprocess.run(
        [
            sys.executable, "tools/tune.py",
            "shift", "tabular-q",
            "--samples", "3", "--rungs", "2", "--eta", "2",
            "--rung-steps", "16384",
            "--space", "lr=0.05,0.2,0.5",
            "--work-dir", str(tmp_path / "tune"),
            "--n-envs", "64", "--chunk-steps", "64",
            "--eval-every", "1000", "--eval-steps", "30",
            "--epsilon-anneal-steps", "8000",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
        env={**os.environ, "SGA_PLATFORM": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    rung0 = [l for l in lines if l.get("rung") == 0]
    rung1 = [l for l in lines if l.get("rung") == 1]
    assert len(rung0) == 3, lines
    assert len(rung1) == 1, lines          # top 1/eta promoted
    assert rung1[0]["steps"] == 32768      # eta× longer budget
    assert "resumed from chunk" in out.stdout  # promotion resumed, not re-ran
    winner = lines[-1]
    assert "winner" in winner and "lr" in winner


def test_tune_final_gate_cli(tmp_path):
    # --final-gate K (round 5, VERDICT r4 #8): the last rung's top-K resume
    # to a budget BEYOND the last rung and the winner is picked by THAT
    # eval — rung returns favor pre-collapse peaks (the shift ppo-cnn sweep
    # promoted a config that collapses after its rung horizon; RESULTS.md).
    out = subprocess.run(
        [
            sys.executable, "tools/tune.py",
            "shift", "tabular-q",
            "--samples", "3", "--rungs", "2", "--eta", "2",
            "--rung-steps", "16384",
            "--space", "lr=0.05,0.2,0.5",
            "--final-gate", "2",
            "--work-dir", str(tmp_path / "tune"),
            "--n-envs", "64", "--chunk-steps", "64",
            "--eval-every", "1000", "--eval-steps", "30",
            "--epsilon-anneal-steps", "8000",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
        env={**os.environ, "SGA_PLATFORM": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    finals = [l for l in lines if l.get("rung") == "final"]
    assert len(finals) == 2, lines                 # top-2 re-scored
    assert finals[0]["steps"] == 16384 * 4         # one rung past the last
    winner = lines[-1]
    assert "winner" in winner
    best_final = max(finals, key=lambda l: l["mean_return"])
    assert winner["winner"] == best_final["cfg"]   # gated on the FINAL eval
