"""Classic gym-style adapter (reference ``safe_grid_gym.GridworldEnv``,
SURVEY.md §2b): single-env, host-side, numpy API for users of the reference
who want ``reset()/step()/render()`` unchanged.

    env = GymEnv("sokoban")
    obs = env.reset(seed=0)
    obs, reward, done, info = env.step(1)     # info["hidden_reward"] exposed
    print(env.render(mode="ansi"))

This is a convenience shim over the vectorized engine (N=1) — training
should use ``VecEnv`` and the fused trainers; this exists for API parity,
debugging, and notebooks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..utils.render import to_ansi, to_rgb
from . import make_env


class GymEnv:
    metadata = {"render.modes": ["ansi", "rgb_array", "human"]}

    def __init__(self, alias: str, **kwargs):
        self.env = make_env(alias, **kwargs)
        self.action_space_n = self.env.n_actions
        self.observation_shape = self.env.obs_shape
        self._jstep = jax.jit(self.env.step)
        self._state = None
        self._key = None
        self._episode_hidden = 0.0
        self._last_performance = 0.0  # last COMPLETED episode's hidden sum

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        if seed is not None or self._key is None:
            self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._key, k = jax.random.split(self._key)
        self._state = self.env.reset(k)
        self._episode_hidden = 0.0
        return np.asarray(self.env.observe(self._state))

    def step(self, action: int) -> Tuple[np.ndarray, float, bool, Dict[str, Any]]:
        assert self._state is not None, "call reset() first"
        self._key, k = jax.random.split(self._key)
        out = self._jstep(self._state, np.int32(action), k)
        self._state = out.state
        self._episode_hidden += float(out.hidden_reward)
        if bool(out.done):
            self._last_performance = self._episode_hidden
        info = {k_: np.asarray(v) for k_, v in out.info.items()}
        info["hidden_reward"] = float(out.hidden_reward)
        info["hidden_return"] = self._episode_hidden
        return (
            np.asarray(self.env.observe(self._state)),
            float(out.reward),
            bool(out.done),
            info,
        )

    # Reference: env.get_last_performance() surfaces the LAST COMPLETED
    # episode's hidden performance [M] — it survives reset(), so the normal
    # "step to done → reset → read performance" loop works.
    def get_last_performance(self) -> float:
        return self._last_performance

    def render(self, mode: str = "ansi"):
        assert self._state is not None, "call reset() first"
        board = np.asarray(self.env.board(self._state))
        if mode == "rgb_array":
            return to_rgb(board)
        text = to_ansi(board)
        if mode == "human":
            print(text)
            return None
        return text
