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


def _ring_positions(batch: Any, idx, cap: int):
    """(batch', positions, advance): ring-write plan for a push of N.

    When N exceeds the (local) capacity the oldest N−cap entries of the push
    can never survive the wrap — drop them statically so the scatter has
    distinct positions. Position mapping matches per-step pushes exactly:
    transition t of the push lands at (idx + t) % cap."""
    n = jax.tree.leaves(batch)[0].shape[0]
    if n > cap:
        skip = n - cap
        batch = jax.tree.map(lambda b: b[skip:], batch)
        pos = (idx + skip + jnp.arange(cap, dtype=jnp.int32)) % cap
    else:
        pos = (idx + jnp.arange(n, dtype=jnp.int32)) % cap
    return batch, pos, n


def _ring_write(storage: Any, batch: Any, pos, idx, cap: int) -> Any:
    """Scatter ``batch`` at ``pos`` — except when the batch replaces the
    ENTIRE ring (chunked trainers pushing T·N ≥ capacity), where the write
    is a pure dynamic roll (two contiguous copies; measured ~14 ms faster
    per 1M-slot push than the equivalent scatter on v5e): the new storage is
    ``batch[(j − idx) % cap]``, i.e. a doubled concat sliced at cap − idx.
    Identical values either way."""
    del idx  # the first write position (pos[0]) already includes any trim
    n = jax.tree.leaves(batch)[0].shape[0]
    if n == cap:
        start = pos[0]
        return jax.tree.map(
            lambda b: jax.lax.dynamic_slice_in_dim(
                jnp.concatenate([b, b], 0), cap - start, cap
            ),
            batch,
        )
    return jax.tree.map(lambda s, b: s.at[pos].set(b), storage, batch)


def push_batch(buf: BufferState, batch: Any) -> BufferState:
    """Write a batch (leading dim N) at rolling positions; N may exceed the
    capacity (the ring keeps the newest entries, as per-step pushes would)."""
    cap = capacity_of(buf)
    batch, pos, n = _ring_positions(batch, buf.idx, cap)
    storage = _ring_write(buf.storage, batch, pos, buf.idx, cap)
    return BufferState(
        storage=storage,
        idx=(buf.idx + n) % cap,
        size=jnp.minimum(buf.size + n, cap),
    )


def sample(buf: BufferState, key, batch_size: int) -> Any:
    """Uniform sample with replacement over the valid prefix."""
    idxs = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return jax.tree.map(lambda s: s[idxs], buf.storage)


# ---- prioritized replay (Schaul et al. 2015), TPU-native -------------------
#
# The classic CPU implementation is a sum-tree for O(log N) proportional
# sampling. On TPU the natural form is data-parallel: keep a dense [capacity]
# priority array and draw via ``jax.random.categorical`` over masked
# log-priorities — one fused softmax-sample over HBM, no pointer chasing, no
# dynamic shapes. New transitions enter at the buffer's current max priority
# so every transition is sampled at least once with high probability.


@struct.dataclass
class PrioritizedBufferState:
    storage: Any              # pytree with leading dim [capacity, ...]
    priorities: jnp.ndarray   # f32 [capacity] — 0 marks invalid slots
    idx: jnp.ndarray          # i32 — next write position
    size: jnp.ndarray         # i32 — valid entries (≤ capacity)


def init_prioritized(capacity: int, example: Any) -> PrioritizedBufferState:
    storage = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        example,
    )
    return PrioritizedBufferState(
        storage=storage,
        priorities=jnp.zeros((capacity,), jnp.float32),
        idx=jnp.int32(0),
        size=jnp.int32(0),
    )


def push_batch_prioritized(
    buf: PrioritizedBufferState, batch: Any,
    eps: float = 0.05, clip: float = 1.0,
) -> PrioritizedBufferState:
    """Ring write; entries arrive at max-seen priority, floored at the max
    priority ``update_priorities`` can ever write back — ``(1+eps)·clip`` —
    so the new-entry bonus tracks the tunable clip. (A fixed floor of 1.0
    with ``clip < 1`` would admit every push at 10×+ the max achievable
    updated priority, skewing sampling toward newest transitions — the
    degeneration ``update_priorities``' docstring warns about.)"""
    cap = buf.priorities.shape[0]
    batch, pos, n = _ring_positions(batch, buf.idx, cap)
    storage = _ring_write(buf.storage, batch, pos, buf.idx, cap)
    p_new = jnp.maximum(buf.priorities.max(), (1.0 + eps) * clip)
    if jax.tree.leaves(batch)[0].shape[0] == cap:
        priorities = jnp.full((cap,), 1.0) * p_new  # full-ring replacement
    else:
        priorities = buf.priorities.at[pos].set(p_new)
    return PrioritizedBufferState(
        storage=storage,
        priorities=priorities,
        idx=(buf.idx + n) % cap,
        size=jnp.minimum(buf.size + n, cap),
    )


def sample_prioritized(
    buf: PrioritizedBufferState, key, batch_size: int, alpha: float, beta
):
    """Proportional sample: P(i) ∝ p_i^α over valid slots. Returns
    (batch, idxs, importance_weights) with weights (N·P(i))^−β normalized by
    the batch max (the standard bias-corrected estimator)."""
    valid = buf.priorities > 0
    logp = alpha * jnp.log(jnp.maximum(buf.priorities, 1e-12))
    logits = jnp.where(valid, logp, -jnp.inf)
    idxs = jax.random.categorical(key, logits, shape=(batch_size,))
    batch = jax.tree.map(lambda s: s[idxs], buf.storage)
    all_probs = jax.nn.softmax(logits)
    n = jnp.maximum(buf.size, 1).astype(jnp.float32)
    weights = jnp.power(n * all_probs[idxs], -beta)
    # Normalize to unit MEAN over the batch: the gradient magnitude then
    # matches uniform replay's while the relative importance correction is
    # preserved. (Max normalization — batch- or buffer-wide, as in Schaul
    # et al. — rescales the whole update by whichever rare slot exists, an
    # effective-LR lottery that measurably destabilized sokoban training.)
    return batch, idxs, weights / jnp.maximum(weights.mean(), 1e-12)


def update_priorities(
    buf: PrioritizedBufferState, idxs, td_errors,
    eps: float = 0.05, clip: float = 1.0,
) -> PrioritizedBufferState:
    """Write back min(|δ|, clip) + ε·clip for the sampled slots.

    Two guards, both load-bearing with unclipped rewards (these envs pay
    ±50) — each was isolated from an observed sokoban training failure:

    * the **clip**: without it one early high-|δ| slot pins
      ``max(priorities)``, every new push inherits that max, and sampling
      degenerates to newest-transitions-only (learning stops entirely).
      Clipping — the role reward clipping plays in the Atari PER setup —
      makes early training uniform and lets prioritization differentiate
      transitions as errors shrink below the clip.
    * the **floor** (ε as a fraction of the clip): it bounds the resample-
      rate ratio between mastered (δ≈0) and hard (δ≥clip) transitions at
      (1+ε)/ε. With a 1e-3 floor mastered transitions are starved ~1000×
      and the Q-net drifts on them — a converged policy visibly
      destabilizes (45 → −100 eval oscillation). ε=0.05 keeps refresh
      traffic on everything while still focusing 20× on the frontier."""
    # Sampling is with replacement, so idxs may repeat — but duplicates of
    # one slot carry the same transition and params, hence identical |δ|,
    # so the duplicate scatter writes equal values (deterministic).
    # Floor at a small positive value: the valid mask is ``priorities > 0``,
    # so with eps=0 a zero-TD slot would otherwise become permanently
    # unsampleable (masked out as if never written).
    p = jnp.maximum(jnp.minimum(jnp.abs(td_errors), clip) + eps * clip, 1e-6)
    return buf.replace(priorities=buf.priorities.at[idxs].set(p))
