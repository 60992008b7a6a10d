"""On-device ring replay buffer.

Replaces the reference's Python ``deque`` ReplayBuffer (SURVEY.md §2a #11)
with the design §2d mandates: fixed-shape arrays with a modular write index,
living in HBM, written in N-sized batches per vectorized env step and
sampled uniformly inside jit. Stores *compact env states* (not rendered
observations) — observations are re-rendered at sample time, trading a few
gathers for an order of magnitude less HBM traffic.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BufferState:
    storage: Any          # pytree with leading dim [capacity, ...]
    idx: jnp.ndarray      # i32 — next write position
    size: jnp.ndarray     # i32 — valid entries (≤ capacity)


def init(capacity: int, example: Any) -> BufferState:
    """Allocate a buffer shaped like ``example`` (one transition, no batch)."""
    storage = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype), example
    )
    return BufferState(storage=storage, idx=jnp.int32(0), size=jnp.int32(0))


def capacity_of(buf: BufferState) -> int:
    return jax.tree.leaves(buf.storage)[0].shape[0]


def push_batch(buf: BufferState, batch: Any) -> BufferState:
    """Write a batch (leading dim N) at rolling positions. N ≤ capacity."""
    n = jax.tree.leaves(batch)[0].shape[0]
    cap = capacity_of(buf)
    # Shapes are static: enforce at trace time. A batch wider than the ring
    # would scatter duplicate positions and silently drop transitions.
    assert n <= cap, (
        f"replay push of {n} transitions exceeds (local) capacity {cap}; "
        f"raise --replay-capacity or lower --n-envs"
    )
    pos = (buf.idx + jnp.arange(n, dtype=jnp.int32)) % cap
    storage = jax.tree.map(lambda s, b: s.at[pos].set(b), buf.storage, batch)
    return BufferState(
        storage=storage,
        idx=(buf.idx + n) % cap,
        size=jnp.minimum(buf.size + n, cap),
    )


def sample(buf: BufferState, key, batch_size: int) -> Any:
    """Uniform sample with replacement over the valid prefix."""
    idxs = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return jax.tree.map(lambda s: s[idxs], buf.storage)
