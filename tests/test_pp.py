"""Pipeline parallelism (parallel/pp.py): GPipe schedule ≡ sequential
program, forward and backward, with stage-local parameters.

SURVEY.md §2d documents PP as unnecessary at gridworld scale; these tests
prove the runtime nonetheless executes it correctly (design decision, not
capability gap) on a 4-stage mesh of virtual CPU devices.
"""
import jax
import jax.numpy as jnp
import pytest

from safe_grid_agents_tpu.parallel.pp import (
    STAGE_AXIS,
    init_pp_params,
    make_pp_mesh,
    pipeline_apply,
    place_pp,
    pp_train_step,
    sequential_apply,
)

S, L, D, M, MB = 4, 2, 16, 6, 4


@pytest.fixture(scope="module")
def setup():
    mesh = make_pp_mesh(S)
    params = place_pp(mesh, init_pp_params(jax.random.PRNGKey(0), S, D, L))
    xs = jax.random.normal(jax.random.PRNGKey(1), (M, MB, D))
    return mesh, params, xs


def test_forward_matches_sequential(setup):
    mesh, params, xs = setup
    ys_pp = jax.jit(lambda p, x: pipeline_apply(mesh, p, x))(params, xs)
    ys_seq = jax.jit(sequential_apply)(params, xs)
    assert jnp.allclose(ys_pp, ys_seq, atol=1e-6), (
        float(jnp.abs(ys_pp - ys_seq).max())
    )


def test_backward_matches_sequential(setup):
    mesh, params, xs = setup
    targets = jax.random.normal(jax.random.PRNGKey(2), xs.shape)

    def loss_pp(p):
        return jnp.mean(jnp.square(pipeline_apply(mesh, p, xs) - targets))

    def loss_seq(p):
        return jnp.mean(jnp.square(sequential_apply(p, xs) - targets))

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        assert jnp.allclose(a, b, atol=1e-6), float(jnp.abs(a - b).max())


def test_params_and_grads_stay_stage_sharded(setup):
    mesh, params, xs = setup
    assert STAGE_AXIS in str(params["w"].sharding.spec)
    targets = jnp.zeros_like(xs)
    grads = jax.jit(
        jax.grad(
            lambda p: jnp.mean(jnp.square(pipeline_apply(mesh, p, xs) - targets))
        )
    )(params)
    # Each stage's gradient is computed (and stays) on the stage's device.
    assert STAGE_AXIS in str(grads["w"].sharding.spec)


def test_train_step_learns(setup):
    mesh, params, xs = setup
    targets = jax.random.normal(jax.random.PRNGKey(3), xs.shape)
    step = jax.jit(lambda p: pp_train_step(mesh, p, xs, targets, lr=0.05))
    _, loss0 = step(params)
    for _ in range(30):
        params, loss = step(params)
    assert float(loss) < float(loss0) * 0.7, (float(loss0), float(loss))
