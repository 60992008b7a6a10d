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
    eps = float(stats.episodes)
    if eps == 0.0:
        # No episode finished in the window (e.g. a greedy policy that never
        # terminates inside --eval-steps): report the means as MISSING, not
        # 0.0 — a genuine zero return must stay distinguishable in the logs.
        mean = float("nan")
        return {
            "episodes": 0.0,
            "mean_return": mean,
            "mean_hidden": mean,
            "mean_length": mean,
            "env_steps": float(stats.env_steps),
        }
    return {
        "episodes": eps,
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
    min_episodes: int | None = None,
    state_view: Callable[[Any], Any] | None = None,
    accumulate: Callable[[ChunkStats, Any], ChunkStats] | None = None,
) -> Tuple[Any, ChunkStats]:
    """Greedy rollout (reference eval.py: greedy episodes, average observed
    return + hidden performance).

    ``min_episodes=None``: fixed ``n_steps`` scan. ``min_episodes=E``
    (reference ``--eval-episodes``, SURVEY.md §2a #4): step until ≥E episodes
    have finished, bounded by ``n_steps`` — a ``lax.while_loop`` with the
    done-count in the carry. The bound is a hard stop; the caller sizes it so
    the episode target is reachable (every instance finishes ≥1 episode per
    ``env.max_steps`` steps via the timeout).

    ``state_view``/``accumulate`` adapt non-VecEnv runtimes (the MXU engine's
    carry holds indices and its step returns a dict): defaults are VecEnv's
    ``vs.env`` view and ``ChunkStats.accumulate``."""
    if state_view is None:
        state_view = lambda vs: vs.env  # noqa: E731
    if accumulate is None:
        accumulate = lambda stats, out: stats.accumulate(out)  # noqa: E731

    def step1(vs, k, stats):
        k, ka = jax.random.split(k)
        actions = act_fn(astate, state_view(vs), ka)
        vs, out = vec.step(vs, actions)
        return vs, k, accumulate(stats, out)

    if min_episodes is None:
        def body(carry, _):
            return step1(*carry), None

        (vstate, _, stats), _ = jax.lax.scan(
            body, (vstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return vstate, stats

    target = jnp.float32(min_episodes)

    def cond(carry):
        _, _, stats, t = carry
        return (stats.episodes < target) & (t < n_steps)

    def body(carry):
        vs, k, stats, t = carry
        vs, k, stats = step1(vs, k, stats)
        return vs, k, stats, t + 1

    vstate, _, stats, _ = jax.lax.while_loop(
        cond, body, (vstate, key, ChunkStats.zero(), jnp.int32(0))
    )
    return vstate, stats
