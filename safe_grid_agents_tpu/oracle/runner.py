"""Oracle runner: single-instance, plain-Python episode driver.

Role (SURVEY.md §4): the reference's parity oracle was the
ai-safety-gridworlds per-env unit-test suite; neither it nor pycolab is
installable here, so the in-repo oracle engine IS the canonical semantics.
Oracle envs are written in straightforward imperative Python (explicit
if/else, mutable dict state) — deliberately a different style from the
array engine's branch-free masked arithmetic, so the two implementations
cross-check each other.

RNG contract (must match ``envs.vec.VecEnv`` exactly):

* instance key  -> split(2) = (k_init, k)    reset consumes k_init
* each step: (k_step, k_reset, k_next) = split(k, 3)
  - env.step consumes k_step (per-env draw protocol documented in each env)
  - if done: re-init consumes k_reset
  - k = k_next

All randomness uses ``jax.random`` (threefry — bitwise identical on CPU and
TPU), so "bitwise parity" is meaningful across backends.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


class OracleEnv:
    """Base for oracle envs. State is a plain mutable dict."""

    n_actions = 4
    max_steps = 100

    def reset(self, key) -> Dict[str, Any]:
        raise NotImplementedError

    def step(self, state: Dict[str, Any], action: int, key) -> Tuple[float, float, bool]:
        """Mutates ``state``; returns (reward, hidden_reward, done)."""
        raise NotImplementedError

    def carry_reset(self, state: Dict[str, Any], key) -> Dict[str, Any]:
        return self.reset(key)

    # Optional: board render for debugging/golden tests.
    def board(self, state) -> np.ndarray:
        raise NotImplementedError


class OracleRunner:
    """Drives one oracle instance with the VecEnv key discipline and records
    the full trajectory for comparison against the vectorized engine."""

    def __init__(self, env: OracleEnv, instance_key):
        self.env = env
        k_init, self.key = jax.random.split(instance_key, 2)
        self.state = env.reset(k_init)
        self.rewards: List[float] = []
        self.hiddens: List[float] = []
        self.dones: List[bool] = []
        self.finished_returns: List[float] = []
        self.finished_hiddens: List[float] = []
        self.finished_lens: List[int] = []
        self._ep_r = 0.0
        self._ep_h = 0.0
        self._ep_l = 0

    def step(self, action: int) -> Tuple[float, float, bool]:
        k_step, k_reset, k_next = jax.random.split(self.key, 3)
        self.key = k_next
        r, h, done = self.env.step(self.state, int(action), k_step)
        self._ep_r += r
        self._ep_h += h
        self._ep_l += 1
        self.rewards.append(r)
        self.hiddens.append(h)
        self.dones.append(done)
        if done:
            self.finished_returns.append(self._ep_r)
            self.finished_hiddens.append(self._ep_h)
            self.finished_lens.append(self._ep_l)
            self._ep_r, self._ep_h, self._ep_l = 0.0, 0.0, 0
            self.state = self.env.carry_reset(self.state, k_reset)
        return r, h, done
