"""Build the native oracle: regenerate spec.h from the Python ART, compile
the shared library, and return a ctypes handle.

    from native.build import load_oracle
    lib = load_oracle()           # builds if stale

The build is a plain g++ invocation (no network, no external deps); the
artifact lands in native/liboracle.so and is rebuilt whenever oracle.cpp or
the generated spec.h changes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

ENV_IDS = {
    "shift": 0,
    "shift-test": 1,
    "island": 2,
    "sokoban": 3,
    "boat": 4,
    "toy": 5,
    "corners": 6,
    "way": 7,
}

# Stochastic / stateful envs, driven through run_trajectory2 with harness-
# supplied draw-outcome streams (tests/test_native_stochastic.py). Together
# with ENV_IDS this covers every registry alias (tomato-crmdp shares the
# tomato dynamics).
STOCH_ENV_IDS = {
    "tomato": 8,
    "tomato-crmdp": 8,
    "whisky": 9,
    "absent": 10,
    "interrupt": 11,
    "conveyor": 12,
    "conveyor-sushi": 13,
    "friend": 14,
    "foe": 15,
    "neutral": 16,
    "sokoban2": 17,
}


def build(force: bool = False) -> str:
    spec = os.path.join(HERE, "spec.h")
    cpp = os.path.join(HERE, "oracle.cpp")
    so = os.path.join(HERE, "liboracle.so")
    subprocess.run(
        [sys.executable, os.path.join(HERE, "gen_spec.py"), spec],
        check=True,
        cwd=REPO,
        capture_output=True,
    )
    if (
        force
        or not os.path.exists(so)
        or os.path.getmtime(so) < max(os.path.getmtime(cpp), os.path.getmtime(spec))
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so, cpp],
            check=True,
            cwd=HERE,
        )
    return so


def load_oracle() -> ctypes.CDLL:
    lib = ctypes.CDLL(build())
    lib.run_trajectory.restype = ctypes.c_int
    lib.run_trajectory.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.run_trajectory2.restype = ctypes.c_int
    lib.run_trajectory2.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    return lib


def run_trajectory2(lib, alias: str, actions, step_draws, reset_draws):
    """Stochastic-env trajectory: `step_draws` [n, k] float32 per-step draw
    outcomes (k may be 0), `reset_draws` [m] float32 reset outcomes consumed
    in order (initial reset first, one per auto-reset)."""
    import numpy as np

    acts = np.ascontiguousarray(actions, dtype=np.int32)
    n = len(acts)
    sd = np.ascontiguousarray(step_draws, dtype=np.float32).reshape(n, -1)
    rd = np.ascontiguousarray(reset_draws, dtype=np.float32).reshape(-1)
    rewards = np.zeros(n, np.float32)
    hiddens = np.zeros(n, np.float32)
    dones = np.zeros(n, np.uint8)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.run_trajectory2(
        STOCH_ENV_IDS[alias],
        acts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        sd.ctypes.data_as(fp),
        sd.shape[1],
        rd.ctypes.data_as(fp),
        len(rd),
        rewards.ctypes.data_as(fp),
        hiddens.ctypes.data_as(fp),
        dones.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    assert rc == 0, f"native stochastic oracle failed for {alias} (rc={rc})"
    return rewards, hiddens, dones.astype(bool)


def run_trajectory(lib, alias: str, actions):
    import numpy as np

    acts = np.ascontiguousarray(actions, dtype=np.int32)
    n = len(acts)
    rewards = np.zeros(n, np.float32)
    hiddens = np.zeros(n, np.float32)
    dones = np.zeros(n, np.uint8)
    rc = lib.run_trajectory(
        ENV_IDS[alias],
        acts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        rewards.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hiddens.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dones.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    assert rc == 0, f"native oracle failed for {alias}"
    return rewards, hiddens, dones.astype(bool)
