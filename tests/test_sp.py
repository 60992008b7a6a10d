"""Sequence parallelism (parallel/sp.py): ring attention ≡ full softmax
attention, forward and backward, with sequence-sharded operands.

SURVEY.md §2d documents SP as unnecessary for parity (no attention in the
reference stack); these tests prove the runtime executes it anyway, on a
4-shard ring of virtual CPU devices. Completes the executed parallelism
matrix: DP, TP, PP, EP, SP.
"""
import jax
import jax.numpy as jnp
import pytest

from safe_grid_agents_tpu.parallel.sp import (
    SEQ_AXIS,
    full_attention,
    make_sp_mesh,
    place_sp,
    ring_attention,
)

S, L, D = 4, 32, 16  # 4 shards of 8 positions each


@pytest.fixture(scope="module")
def setup():
    mesh = make_sp_mesh(S)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (L, D)) for kk in ks)
    q, k, v = place_sp(mesh, q, k, v)
    return mesh, q, k, v


def test_forward_matches_full_attention(setup):
    mesh, q, k, v = setup
    out_ring = jax.jit(lambda q, k, v: ring_attention(mesh, q, k, v))(q, k, v)
    out_full = jax.jit(full_attention)(q, k, v)
    assert jnp.allclose(out_ring, out_full, atol=1e-5), (
        float(jnp.abs(out_ring - out_full).max())
    )


def test_output_stays_sequence_sharded(setup):
    mesh, q, k, v = setup
    out = jax.jit(lambda q, k, v: ring_attention(mesh, q, k, v))(q, k, v)
    assert SEQ_AXIS in str(out.sharding.spec)


def test_backward_matches_full_attention(setup):
    mesh, q, k, v = setup
    t = jax.random.normal(jax.random.PRNGKey(4), (L, D))

    def loss_ring(q, k, v):
        return jnp.mean(jnp.square(ring_attention(mesh, q, k, v) - t))

    def loss_full(q, k, v):
        return jnp.mean(jnp.square(full_attention(q, k, v) - t))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.jit(jax.grad(loss_full, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g_ring, g_full):
        assert jnp.allclose(a, b, atol=1e-5), (
            name, float(jnp.abs(a - b).max())
        )


def test_no_full_score_matrix_needed(setup):
    # The streaming form works at block sizes where [L, L] would not be an
    # issue here, but the invariant that matters is shape: every
    # intermediate inside the shard is [L/S, L/S] or [L/S, d].
    mesh, q, k, v = setup
    jaxpr = jax.make_jaxpr(lambda q, k, v: ring_attention(mesh, q, k, v))(
        q, k, v
    )
    assert f"{L},{L}" not in str(jaxpr), "full [L, L] score matrix appeared"
