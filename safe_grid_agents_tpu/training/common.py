"""Shared training-loop machinery.

The reference's L3 loops (SURVEY.md §2a #3-5: learn.py/eval.py/warmup.py)
drive one env step at a time from Python. Here the unit of work is a fused
*chunk*: one jitted ``lax.scan`` advancing N envs for T steps together with
the agent's act/learn — the device never waits on Python inside a chunk
(SURVEY.md §3.5 target stack).

Episode metrics are accumulated on-device: each chunk returns summed
finished-episode statistics (count / observed return / hidden performance /
length), which the host turns into means for logging.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..envs.vec import VecEnv, VecStepOut


@struct.dataclass
class ChunkStats:
    """Summed episode stats over a chunk (host divides by episodes)."""

    episodes: jnp.ndarray      # f32 — number of finished episodes
    return_sum: jnp.ndarray    # f32 — Σ observed episode returns
    hidden_sum: jnp.ndarray    # f32 — Σ hidden episode performances
    length_sum: jnp.ndarray    # f32 — Σ episode lengths
    env_steps: jnp.ndarray     # f32 — env transitions taken

    @staticmethod
    def zero() -> "ChunkStats":
        z = jnp.float32(0.0)
        return ChunkStats(z, z, z, z, z)

    def accumulate(self, out: VecStepOut) -> "ChunkStats":
        d = out.done.astype(jnp.float32)
        return ChunkStats(
            episodes=self.episodes + d.sum(),
            return_sum=self.return_sum + (d * out.finished_return).sum(),
            hidden_sum=self.hidden_sum + (d * out.finished_hidden).sum(),
            length_sum=self.length_sum + (d * out.finished_len).sum(),
            env_steps=self.env_steps + d.shape[0],
        )

    def merge(self, other: "ChunkStats") -> "ChunkStats":
        return jax.tree.map(lambda a, b: a + b, self, other)


def stats_to_host(stats: ChunkStats) -> Dict[str, float]:
    eps = max(float(stats.episodes), 1.0)
    return {
        "episodes": float(stats.episodes),
        "mean_return": float(stats.return_sum) / eps,
        "mean_hidden": float(stats.hidden_sum) / eps,
        "mean_length": float(stats.length_sum) / eps,
        "env_steps": float(stats.env_steps),
    }


def reward_source(out: VecStepOut, cheat: bool) -> jnp.ndarray:
    """Observed reward, or the hidden signal under ``--cheat``
    (SURVEY.md §0: debugging upper bound that trains on the true reward)."""
    return out.hidden_reward if cheat else out.reward


def eval_chunk(
    vec: VecEnv,
    act_fn: Callable[[Any, Any, jnp.ndarray], jnp.ndarray],
    astate: Any,
    vstate: Any,
    key,
    n_steps: int,
) -> Tuple[Any, ChunkStats]:
    """Greedy rollout for ``n_steps`` (reference eval.py: greedy episodes,
    average observed return + hidden performance)."""

    def body(carry, _):
        vs, k, stats = carry
        k, ka = jax.random.split(k)
        actions = act_fn(astate, vs.env, ka)
        vs, out = vec.step(vs, actions)
        return (vs, k, stats.accumulate(out)), None

    (vstate, _, stats), _ = jax.lax.scan(
        body, (vstate, key, ChunkStats.zero()), None, length=n_steps
    )
    return vstate, stats
