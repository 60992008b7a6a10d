"""Sequence/context parallelism over a ``seq`` mesh axis — ring attention.

SURVEY.md §2d/§5 document SP as N/A for parity (no attention exists anywhere
in the reference stack; the longest "sequence" is a ≤100-step episode that
``lax.scan`` handles in-device). This module demonstrates the capability
regardless, completing the parallelism matrix (DP/TP/PP/EP/SP all executed):
**ring attention** (Liu et al. 2023) — the sequence is sharded over devices,
each device keeps its Q block resident and the K/V blocks travel the ring
via ``lax.ppermute``, one hop per step, while attention accumulates in the
streaming (flash/online-softmax) form, so no device ever materializes the
[L, L] score matrix or the whole K/V.

TPU mapping: per hop, compute is one [L/S, d]×[d, L/S] matmul pair on the
MXU and communication is one K/V block ppermute over ICI — compute and
collective sizes both scale 1/S, the canonical context-parallel balance.
Autodiff runs the reverse ring (``ppermute``'s transpose is the inverse
permutation), so ``jax.grad`` gives exact gradients with the same locality.

No reference counterpart (SURVEY.md §2d) — new capability, demonstrated and
parity-tested against full-sequence attention (tests/test_sp.py).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

SEQ_AXIS = "seq"


def make_sp_mesh(n_shards: int, devices=None) -> Mesh:
    from .mesh import make_1d_mesh

    return make_1d_mesh(SEQ_AXIS, n_shards, devices)


def full_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Ground truth: ordinary softmax attention on the whole sequence.
    q/k/v [L, d] → [L, d]."""
    scores = (q @ k.T) / jnp.sqrt(jnp.float32(q.shape[-1]))
    return jax.nn.softmax(scores, axis=-1) @ v


def ring_attention(mesh: Mesh, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Ring attention over the ``seq`` axis. q/k/v [L, d] arrive sequence-
    sharded (leading axis over ``seq``); returns [L, d] sharded the same way.
    Per hop: online-softmax accumulate the local Q block against the visiting
    K/V block, then ppermute K/V one position around the ring.
    """
    n_shards = mesh.shape[SEQ_AXIS]
    ring = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(SEQ_AXIS), P(SEQ_AXIS), P(SEQ_AXIS)),
        out_specs=P(SEQ_AXIS),
    )
    def run(q, k, v):
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))

        def hop(carry, _):
            k_blk, v_blk, m, l, o = carry
            s = (q @ k_blk.T) * scale                      # [Lq, Lk] block
            m_new = jnp.maximum(m, s.max(-1))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[:, None])
            l = l * corr + p.sum(-1)
            o = o * corr[:, None] + p @ v_blk
            k_blk = jax.lax.ppermute(k_blk, SEQ_AXIS, ring)
            v_blk = jax.lax.ppermute(v_blk, SEQ_AXIS, ring)
            return (k_blk, v_blk, m_new, l, o), None

        init = (
            k,
            v,
            jnp.full(q.shape[:1], -jnp.inf, q.dtype) + 0.0 * q[:, 0],
            jnp.zeros(q.shape[:1], q.dtype) + 0.0 * q[:, 0],
            jnp.zeros_like(q),
        )
        (k_blk, v_blk, m, l, o), _ = jax.lax.scan(
            hop, init, None, length=n_shards
        )
        return o / l[:, None]

    return run(q, k, v)


def place_sp(mesh: Mesh, *arrays) -> Tuple[jnp.ndarray, ...]:
    """Commit [L, d] arrays sequence-sharded over the ring."""
    sh = NamedSharding(mesh, P(SEQ_AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)
