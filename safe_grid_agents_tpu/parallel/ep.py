"""Expert parallelism over an ``expert`` mesh axis — all_to_all MoE demo.

SURVEY.md §2d documents EP as N/A at gridworld model scale (the policy nets
have no experts to shard). As with ``tp.py`` and ``pp.py``, this module
turns that documented decision into demonstrated capability: a real
expert-parallel mixture-of-experts layer — one expert's weights per device,
top-1 token routing with fixed per-pair capacity, and the canonical
dispatch → ``lax.all_to_all`` → expert compute → ``all_to_all`` → combine
data path over ICI — validated against the equivalent dense (every-expert-
everywhere) program, forward and backward.

TPU mapping: tokens are data-sharded over the same axis the experts live
on; routing exchanges only the dispatched token buffers (two all_to_all
hops of [E, C, d] per layer), never the expert weights. Everything is
fixed-shape (capacity C per source→expert pair; overflow tokens fall back
to identity), so the whole layer jits into one XLA program. ``all_to_all``
is differentiable, so ``jax.grad`` runs the reverse exchange and expert
gradients stay expert-local.

No reference counterpart (SURVEY.md §2d: the reference is single-device).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

EXPERT_AXIS = "expert"


def make_ep_mesh(n_experts: int, devices=None) -> Mesh:
    from .mesh import make_1d_mesh

    return make_1d_mesh(EXPERT_AXIS, n_experts, devices)


def init_moe_params(key, n_experts: int, d_model: int, d_hidden: int):
    """Router (replicated) + expert-stacked FFN weights (shard ``P('expert')``
    on the leading axis)."""
    kr, k1, k2 = jax.random.split(key, 3)
    s1 = 1.0 / jnp.sqrt(jnp.float32(d_model))
    s2 = 1.0 / jnp.sqrt(jnp.float32(d_hidden))
    return {
        "router": (jax.random.normal(kr, (d_model, n_experts)) * s1),
        "w_in": jax.random.normal(k1, (n_experts, d_model, d_hidden)) * s1,
        "w_out": jax.random.normal(k2, (n_experts, d_hidden, d_model)) * s2,
    }


def _expert_ffn(w_in, w_out, x):
    return jnp.tanh(x @ w_in) @ w_out


def dense_moe_apply(params: Any, x: jnp.ndarray) -> jnp.ndarray:
    """Ground truth: run EVERY expert on every token, gather the routed
    output. x [B, d] → [B, d]."""
    e = jnp.argmax(x @ params["router"], -1)                        # [B]
    all_out = jax.vmap(_expert_ffn, in_axes=(0, 0, None))(
        params["w_in"], params["w_out"], x
    )                                                               # [E, B, d]
    return jnp.take_along_axis(
        all_out, e[None, :, None], axis=0
    )[0] + x


def ep_moe_apply(mesh: Mesh, params: Any, xs: jnp.ndarray, capacity: int):
    """Expert-parallel MoE forward. ``xs`` [E, b, d] is token-sharded over
    ``expert`` (leading axis); expert weights are expert-sharded; the router
    is replicated. ``capacity`` is the max tokens any one source shard may
    send to any one expert; tokens past capacity pass through the residual
    path unchanged (standard MoE drop semantics — choose C ≥ b for exact
    parity with the dense program).
    """
    n_experts = mesh.shape[EXPERT_AXIS]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(EXPERT_AXIS), P(EXPERT_AXIS), P(EXPERT_AXIS)),
        out_specs=P(EXPERT_AXIS),
    )
    def run(router, w_in, w_out, xs):
        x = xs[0]                                   # local tokens [b, d]
        w_in, w_out = w_in[0], w_out[0]             # this device's expert
        b, d = x.shape
        e = jnp.argmax(x @ router, -1)              # dest expert per token

        # Fixed-shape dispatch: token i gets slot (e[i], rank of i among
        # same-destination tokens); ranks >= capacity are dropped.
        onehot = jax.nn.one_hot(e, n_experts, dtype=jnp.int32)      # [b, E]
        rank = jnp.cumsum(onehot, axis=0) * onehot                  # 1-based
        pos = (rank.sum(-1) - 1).astype(jnp.int32)                  # [b]
        keep = pos < capacity
        send = jnp.zeros((n_experts, capacity, d), x.dtype)
        send = send.at[e, pos].add(jnp.where(keep[:, None], x, 0.0))

        # Exchange: device k's row j → device j's row k.
        recv = jax.lax.all_to_all(
            send, EXPERT_AXIS, split_axis=0, concat_axis=0, tiled=False
        )                                            # [E, C, d] from each src
        out = _expert_ffn(w_in, w_out, recv.reshape(-1, d))
        back = jax.lax.all_to_all(
            out.reshape(n_experts, capacity, d),
            EXPERT_AXIS, split_axis=0, concat_axis=0, tiled=False,
        )                                            # [E, C, d] routed home

        # Combine: token i reads its slot back from its expert's return.
        y = back[e, pos]                             # [b, d]
        y = jnp.where(keep[:, None], y, 0.0)
        return (x + y)[None]

    return run(params["router"], params["w_in"], params["w_out"], xs)


def place_ep(mesh: Mesh, params: Any) -> Any:
    """Router replicated; expert stacks on their home devices."""
    return {
        "router": jax.device_put(
            params["router"], NamedSharding(mesh, P())
        ),
        "w_in": jax.device_put(
            params["w_in"], NamedSharding(mesh, P(EXPERT_AXIS))
        ),
        "w_out": jax.device_put(
            params["w_out"], NamedSharding(mesh, P(EXPERT_AXIS))
        ),
    }


def ep_train_step(
    mesh: Mesh, params: Any, xs: jnp.ndarray, targets: jnp.ndarray,
    capacity: int, lr: float,
) -> Tuple[Any, jnp.ndarray]:
    """One SGD step on MSE through the expert-parallel layer: the backward
    all_to_all returns each expert's gradient to its own device."""

    def loss_fn(p):
        ys = ep_moe_apply(mesh, p, xs, capacity)
        return jnp.mean(jnp.square(ys - targets))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return params, loss
