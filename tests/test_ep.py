"""Expert parallelism (parallel/ep.py): all_to_all-routed MoE ≡ dense
every-expert program, forward and backward, with expert-local weights.

SURVEY.md §2d documents EP as unnecessary at gridworld scale; these tests
prove the runtime executes it correctly anyway (capability, not gap), on a
4-expert mesh of virtual CPU devices.
"""
import jax
import jax.numpy as jnp
import pytest

from safe_grid_agents_tpu.parallel.ep import (
    EXPERT_AXIS,
    dense_moe_apply,
    ep_moe_apply,
    ep_train_step,
    init_moe_params,
    make_ep_mesh,
    place_ep,
)

E, B_LOCAL, D, H = 4, 8, 16, 32
CAP = B_LOCAL  # capacity >= local batch → nothing drops → exact parity


@pytest.fixture(scope="module")
def setup():
    mesh = make_ep_mesh(E)
    params = place_ep(mesh, init_moe_params(jax.random.PRNGKey(0), E, D, H))
    xs = jax.random.normal(jax.random.PRNGKey(1), (E, B_LOCAL, D))
    return mesh, params, xs


def test_routing_is_nontrivial(setup):
    _, params, xs = setup
    e = jnp.argmax(xs.reshape(-1, D) @ params["router"], -1)
    assert len(jnp.unique(e)) > 1, "degenerate router: all tokens one expert"


def test_forward_matches_dense(setup):
    mesh, params, xs = setup
    ys_ep = jax.jit(
        lambda p, x: ep_moe_apply(mesh, p, x, CAP)
    )(params, xs)
    ys_dense = jax.jit(dense_moe_apply)(params, xs.reshape(-1, D))
    assert jnp.allclose(ys_ep.reshape(-1, D), ys_dense, atol=1e-6), (
        float(jnp.abs(ys_ep.reshape(-1, D) - ys_dense).max())
    )


def test_backward_matches_dense(setup):
    mesh, params, xs = setup
    targets = jax.random.normal(jax.random.PRNGKey(2), xs.shape)

    def loss_ep(p):
        return jnp.mean(jnp.square(ep_moe_apply(mesh, p, xs, CAP) - targets))

    def loss_dense(p):
        ys = dense_moe_apply(p, xs.reshape(-1, D))
        return jnp.mean(jnp.square(ys - targets.reshape(-1, D)))

    g_ep = jax.jit(jax.grad(loss_ep))(params)
    g_dense = jax.jit(jax.grad(loss_dense))(params)
    for k in ("router", "w_in", "w_out"):
        assert jnp.allclose(g_ep[k], g_dense[k], atol=1e-6), (
            k, float(jnp.abs(g_ep[k] - g_dense[k]).max())
        )


def test_capacity_overflow_falls_back_to_residual(setup):
    mesh, params, xs = setup
    # capacity 1: at most one token per (source, expert) pair is processed;
    # every dropped token must pass through unchanged (residual identity).
    ys = jax.jit(lambda p, x: ep_moe_apply(mesh, p, x, 1))(params, xs)
    flat_x = xs.reshape(-1, D)
    flat_y = ys.reshape(-1, D)
    passed_through = jnp.all(jnp.abs(flat_y - flat_x) < 1e-7, axis=-1)
    assert int(passed_through.sum()) > 0, "capacity-1 dropped nothing?"
    # And processed tokens still match the dense program's output rows.
    dense = dense_moe_apply(params, flat_x)
    processed = ~passed_through
    assert jnp.allclose(flat_y[processed], dense[processed], atol=1e-6)


def test_expert_grads_stay_expert_sharded(setup):
    mesh, params, xs = setup
    targets = jnp.zeros_like(xs)
    grads = jax.jit(
        jax.grad(
            lambda p: jnp.mean(
                jnp.square(ep_moe_apply(mesh, p, xs, CAP) - targets)
            )
        )
    )(params)
    assert EXPERT_AXIS in str(grads["w_in"].sharding.spec)
    assert EXPERT_AXIS in str(grads["w_out"].sharding.spec)


def test_train_step_learns(setup):
    mesh, params, xs = setup
    targets = jax.random.normal(jax.random.PRNGKey(3), xs.shape)
    step = jax.jit(lambda p: ep_train_step(mesh, p, xs, targets, CAP, lr=0.05))
    _, loss0 = step(params)
    for _ in range(40):
        params, loss = step(params)
    assert float(loss) < float(loss0) * 0.8, (float(loss0), float(loss))
