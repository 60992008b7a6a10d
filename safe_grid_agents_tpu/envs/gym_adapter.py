"""Classic gym-style adapter (reference ``safe_grid_gym.GridworldEnv``,
SURVEY.md §2b): single-env, host-side, numpy API for users of the reference
who want ``reset()/step()/render()`` unchanged.

    env = GymEnv("sokoban")                     # alias construction
    env = make("SideEffectsSokoban-v0")         # registration-style id
    env.seed(0)                                  # classic gym seeding
    obs = env.reset()                            # (or reset(seed=0))
    obs, reward, done, info = env.step(1)
    info["hidden_reward"]; info["observed_reward"]   # documented info keys
    print(env.render(mode="ansi"))
    env.get_last_performance()                   # last episode's hidden sum

This is a convenience shim over the vectorized engine (N=1) — training
should use ``VecEnv`` and the fused trainers; this exists so reference
experiment scripts port 1:1 (SURVEY.md §2b gym wrapper row).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..utils.render import to_ansi, to_rgb
from . import make_env


class _DiscreteSpace:
    """Minimal gym.spaces.Discrete stand-in (gym is not a dependency)."""

    def __init__(self, n: int, rng: np.random.Generator):
        self.n = n
        self._rng = rng

    def sample(self) -> int:
        return int(self._rng.integers(self.n))

    def contains(self, a) -> bool:
        return 0 <= int(a) < self.n


class _BoxSpace:
    """Minimal gym.spaces.Box stand-in for the one-hot plane observation."""

    def __init__(self, shape):
        self.shape = tuple(shape)
        self.low, self.high = 0.0, 1.0
        self.dtype = np.float32


class GymEnv:
    metadata = {"render.modes": ["ansi", "rgb_array", "human"]}

    def __init__(self, alias: str, **kwargs):
        self.env = make_env(alias, **kwargs)
        self._np_rng = np.random.default_rng(0)
        self.action_space = _DiscreteSpace(self.env.n_actions, self._np_rng)
        self.observation_space = _BoxSpace(self.env.obs_shape)
        # Back-compat attributes (kept from the round-1 surface).
        self.action_space_n = self.env.n_actions
        self.observation_shape = self.env.obs_shape
        self._jstep = jax.jit(self.env.step)
        self._state = None
        self._key = None
        self._episode_hidden = 0.0
        self._last_performance = 0.0  # last COMPLETED episode's hidden sum

    def seed(self, seed: Optional[int] = None):
        """Classic gym seeding: fixes the env's RNG stream for subsequent
        resets/steps (the reference-era ``env.seed(n)`` API). Returns the
        seed list per the classic contract."""
        seed = 0 if seed is None else int(seed)
        self._key = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)
        self.action_space._rng = self._np_rng
        return [seed]

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        if seed is not None or self._key is None:
            self.seed(seed)
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
        info["observed_reward"] = float(out.reward)
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

    def close(self):
        """Classic gym teardown hook (nothing to release here)."""

    @property
    def unwrapped(self):
        return self


# Registration-style construction: the gym ids safe-grid-gym registers
# [M — SURVEY.md §2b; id spellings from the upstream register() calls],
# mapped onto this package's aliases so `gym.make("...")`-style scripts
# port by swapping the import.
GYM_ID_REGISTRY: Dict[str, str] = {
    "DistributionalShift-v0": "shift",
    "IslandNavigation-v0": "island",
    "SideEffectsSokoban-v0": "sokoban",
    "BoatRace-v0": "boat",
    "TomatoWatering-v0": "tomato",
    "TomatoCrmdp-v0": "tomato-crmdp",
    "WhiskyGold-v0": "whisky",
    "AbsentSupervisor-v0": "absent",
    "SafeInterruptibility-v0": "interrupt",
    "ConveyorBelt-v0": "conveyor",
    "ConveyorBeltSushi-v0": "conveyor-sushi",
    "FriendFoe-v0": "friend",
    "ToyGridworldUncorrupted-v0": "toy",
    "ToyGridworldCorners-v0": "corners",
    "ToyGridworldOnTheWay-v0": "way",
}


def make(env_id: str, **kwargs) -> GymEnv:
    """``gym.make``-style constructor: accepts either a registered gym id
    (``"IslandNavigation-v0"``) or a bare alias (``"island"``)."""
    alias = GYM_ID_REGISTRY.get(env_id, env_id)
    return GymEnv(alias, **kwargs)
