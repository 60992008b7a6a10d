"""Pallas TPU kernel: fused actor-critic MLP forward.

The deep agents' hot op is `obs [B, D] → tanh MLP → (logits [B, A], value
[B])`, executed ~10⁵ times per training run at B = n_envs (collect) and
B = minibatch (update). This kernel runs the whole forward as ONE pallas
program per batch block: both hidden matmuls hit the MXU back-to-back with
their tanh fused on the VPU, all activations staying in VMEM — no HBM
round-trips between layers. The two output heads (policy logits and value)
are packed into a single [H, 128] matrix so the head is one more MXU op,
sliced on the host side.

Sizing (pallas_guide.md tiling rules): D and B-block pad to 128/8 multiples;
hidden width is fixed at 128 (one MXU tile); head lanes padded to 128.
Weights for gridworld nets total < 200 KB — far under the ~16 MB VMEM
budget, so every grid step re-uses them from VMEM.

Backward: registered via ``jax.custom_vjp`` with residuals (x, h1, h2); the
backward matmuls are plain XLA (they're already single fused matmuls — a
pallas version would duplicate XLA's schedule without winning anything; the
forward is where the layer-to-layer fusion pays).

Correctness: `tests/test_ops.py` checks forward and gradients against the
flax reference (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIDDEN = 128          # one MXU tile; both hidden layers use this width
HEAD_PAD = 128        # packed logits+value head lanes
BLOCK_B = 256         # batch rows per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                out_ref, h1_ref, h2_ref):
    h1 = jnp.tanh(
        jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    h2 = jnp.tanh(
        jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    )
    h1_ref[:] = h1
    h2_ref[:] = h2
    out_ref[:] = (
        jnp.dot(h2, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
    )


def _fwd_call(x_p, w1, b1, w2, b2, wh, bh):
    bp, dp = x_p.shape
    grid = (bp // BLOCK_B,)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    row = lambda: pl.BlockSpec(  # batch-blocked operand  # noqa: E731
        (BLOCK_B, None), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out, h1, h2 = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_B, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_B, HEAD_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, HIDDEN), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, HIDDEN), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, HEAD_PAD), jnp.float32),
            jax.ShapeDtypeStruct((bp, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((bp, HIDDEN), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_p, w1, b1, w2, b2, wh, bh)
    return out, h1, h2


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_mlp(x, w1, b1, w2, b2, wh, bh):
    """x [B, D] → packed head output [B, HEAD_PAD].

    Weight shapes: w1 [Dp, 128], b1 [1, 128], w2 [128, 128], b2 [1, 128],
    wh [128, HEAD_PAD], bh [1, HEAD_PAD] with Dp = round_up(D, 128). The
    caller slices logits/value out of the packed head.
    """
    out, _, _ = _fwd_impl(x, w1, b1, w2, b2, wh, bh)
    return out


def _fwd_impl(x, w1, b1, w2, b2, wh, bh):
    b, d = x.shape
    dp = w1.shape[0]
    bp = _round_up(max(b, 1), BLOCK_B)
    x_p = jnp.zeros((bp, dp), jnp.float32).at[:b, :d].set(x)
    out, h1, h2 = _fwd_call(x_p, w1, b1, w2, b2, wh, bh)
    return out[:b], h1, h2


def _fused_fwd(x, w1, b1, w2, b2, wh, bh):
    out, h1, h2 = _fwd_impl(x, w1, b1, w2, b2, wh, bh)
    return out, (x, h1, h2, w1, w2, wh)


def _fused_bwd(res, g):
    x, h1, h2, w1, w2, wh = res
    b, d = x.shape
    h1 = h1[:b]
    h2 = h2[:b]
    # Head: out = h2 @ wh + bh
    dwh = h2.T @ g
    dbh = g.sum(0, keepdims=True)
    dh2 = g @ wh.T
    # Layer 2: h2 = tanh(h1 @ w2 + b2)
    dz2 = dh2 * (1.0 - h2 * h2)
    dw2 = h1.T @ dz2
    db2 = dz2.sum(0, keepdims=True)
    dh1 = dz2 @ w2.T
    # Layer 1: h1 = tanh(x_p @ w1 + b1); x rows beyond b are zero-padded.
    dz1 = dh1 * (1.0 - h1 * h1)
    dp = w1.shape[0]
    x_p = jnp.zeros((b, dp), jnp.float32).at[:, :d].set(x)
    dw1 = x_p.T @ dz1
    db1 = dz1.sum(0, keepdims=True)
    dx = (dz1 @ w1.T)[:, :d]
    return dx, dw1, db1, dw2, db2, dwh, dbh


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


# -- flax integration ------------------------------------------------------

from flax import linen as nn  # noqa: E402


class PallasActorCriticMLP(nn.Module):
    """Drop-in actor-critic using the fused pallas forward.

    Same architecture as ``networks.ActorCriticMLP`` with hidden=(128, 128);
    heads packed as wh[:, :n_actions] = logits, wh[:, n_actions] = value.
    """

    n_actions: int

    @nn.compact
    def __call__(self, obs):
        x = obs.reshape(*obs.shape[:-3], -1).astype(jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        d = x.shape[-1]
        dp = _round_up(d, 128)
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (dp, HIDDEN))
        b1 = self.param("b1", nn.initializers.zeros, (1, HIDDEN))
        w2 = self.param("w2", init, (HIDDEN, HIDDEN))
        b2 = self.param("b2", nn.initializers.zeros, (1, HIDDEN))
        wh = self.param("wh", init, (HIDDEN, HEAD_PAD))
        bh = self.param("bh", nn.initializers.zeros, (1, HEAD_PAD))
        out = fused_mlp(x, w1, b1, w2, b2, wh, bh)
        logits = out[:, : self.n_actions]
        value = out[:, self.n_actions]
        if squeeze:
            logits, value = logits[0], value[0]
        return logits, value
