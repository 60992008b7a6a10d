"""Pipeline parallelism over a ``stage`` mesh axis — GPipe schedule demo.

SURVEY.md §2d documents PP as *not needed* at gridworld model scale (the
policy nets are 2-layer MLPs; there is nothing to cut into stages). Like
``tp.py``, this module exists to prove the claim is a design decision and
not a capability gap: a real pipeline-parallel runtime — stage-sharded
parameters, a GPipe microbatch schedule built from ``lax.ppermute`` ring
shifts inside ``shard_map``, and full autodiff through the schedule so a
training step's gradients stay stage-local — validated against the
equivalent sequential program.

How it maps to TPU: each device owns one stage's weights (never moved);
per-tick communication is ONE activation ppermute hop over ICI to the ring
neighbor — the canonical pipeline layout from the scaling-book recipe. The
schedule is a ``lax.scan`` over M + S - 1 ticks: stage 0 injects microbatch
``t`` at tick ``t``; stage ``S-1`` emits microbatch ``t-(S-1)`` at tick
``t``; the bubble is the standard (S-1)/(M+S-1) fraction. Backward needs no
hand-written schedule — ``ppermute``'s transpose is the inverse permutation,
so ``jax.grad`` of the scanned forward IS the reverse pipeline.

No reference counterpart (the reference is single-process single-device,
SURVEY.md §2d); this is new capability mandated by the parallelism matrix.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

STAGE_AXIS = "stage"


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    from .mesh import make_1d_mesh

    return make_1d_mesh(STAGE_AXIS, n_stages, devices)


def init_pp_params(key, n_stages: int, d_model: int, layers_per_stage: int = 1):
    """Stage-stacked residual-MLP params: leaves lead with the stage axis
    (shard with ``P('stage')``); stage s applies ``layers_per_stage`` blocks
    of ``x + tanh(x @ w + b)``."""
    k = jax.random.normal(key, (n_stages, layers_per_stage, d_model, d_model))
    k = k / jnp.sqrt(jnp.float32(d_model))
    return {
        "w": k.astype(jnp.float32),
        "b": jnp.zeros((n_stages, layers_per_stage, d_model), jnp.float32),
    }


def _stage_block(params: Any, x: jnp.ndarray) -> jnp.ndarray:
    """One stage's compute: scan its residual blocks. params leaves [L, ...]."""

    def layer(x, wb):
        w, b = wb
        return x + jnp.tanh(x @ w + b), None

    x, _ = jax.lax.scan(layer, x, (params["w"], params["b"]))
    return x


def sequential_apply(params: Any, xs: jnp.ndarray) -> jnp.ndarray:
    """Ground truth: run every stage in order on all microbatches at once.
    params leaves [S, L, ...]; xs [M, mb, d]."""

    def stage(x, p):
        return _stage_block(p, x), None

    ys, _ = jax.lax.scan(stage, xs, params)
    return ys

def pipeline_apply(mesh: Mesh, params: Any, xs: jnp.ndarray) -> jnp.ndarray:
    """GPipe forward of the stage-stacked model over the mesh.

    ``params`` leaves lead with the stage axis (placed ``P('stage')``);
    ``xs`` is [M, mb, d] microbatches (replicated). Returns [M, mb, d],
    replicated. Differentiable end-to-end: ``jax.grad`` through this runs
    the reverse schedule with activation hops in the opposite ring
    direction, and each stage's parameter gradient is computed only on the
    device that owns the stage.
    """
    n_stages = mesh.shape[STAGE_AXIS]
    n_micro = xs.shape[0]
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), P()),
        out_specs=P(),
    )
    def run(stacked, xs):
        local = jax.tree.map(lambda p: p[0], stacked)  # this device's stage
        stage = jax.lax.axis_index(STAGE_AXIS)

        def tick(act, t):
            # Stage 0 injects microbatch t (clamped; ticks past M feed the
            # bubble and their results are masked out below).
            inject = xs[jnp.clip(t, 0, n_micro - 1)]
            x_in = jnp.where(stage == 0, inject, act)
            out = _stage_block(local, x_in)
            nxt = jax.lax.ppermute(out, STAGE_AXIS, ring)
            return nxt, out

        # pcast: the carry must be typed device-varying over 'stage' to
        # match the ppermuted output under shard_map's vma checking.
        init = jax.lax.pcast(jnp.zeros_like(xs[0]), STAGE_AXIS, to="varying")
        _, outs = jax.lax.scan(
            tick, init, jnp.arange(n_micro + n_stages - 1)
        )
        # Microbatch m leaves the last stage at tick m + S - 1.
        ys = jax.lax.dynamic_slice_in_dim(outs, n_stages - 1, n_micro, axis=0)
        mask = (stage == n_stages - 1).astype(ys.dtype)
        return jax.lax.psum(ys * mask, STAGE_AXIS)

    return run(params, xs)


def place_pp(mesh: Mesh, params: Any) -> Any:
    """Commit stage-stacked params to their home devices (leading-axis
    ``P('stage')``): each stage's weights live only on its device."""
    return jax.tree.map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P(STAGE_AXIS))), params
    )


def pp_train_step(
    mesh: Mesh, params: Any, xs: jnp.ndarray, targets: jnp.ndarray, lr: float
) -> Tuple[Any, jnp.ndarray]:
    """One SGD step of the pipelined model on an MSE objective. Gradients
    (and the update) are computed stage-locally; nothing but activations
    ever crosses devices."""

    def loss_fn(p):
        ys = pipeline_apply(mesh, p, xs)
        return jnp.mean(jnp.square(ys - targets))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return params, loss
