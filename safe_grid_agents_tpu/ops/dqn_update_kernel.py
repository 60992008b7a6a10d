"""Fused pallas DQN UPDATE kernel: U sampled TD updates in ONE kernel,
params + target params + Adam moments resident in VMEM (round 5).

With collect fused (`ops/dqn_kernel.py`) the DQN chunk's remaining wall is
the XLA update scan (~0.1 ms of kernel-boundary latency per sampled
update — the round-4 decomposition's "update phase" row, which only
stopped mattering while collect cost 28 ms). Unlike collect, params CHANGE
every update, so the network really does run in-kernel — the PPO optimize
kernel's machinery (`ops/ppo_kernel.py`) with the DQN loss:

    fold recompute   foldT = w1ᵀ @ Oᵀ         per update (and for the
                                              target net, per sync)
    forward          x1 = relu(foldT@oh+b1); x2 = relu(W2ᵀx1+b2);
                     q = H3ᵀx2 + b3           (A rows of the head tensor)
    target           boot = max_a targetQ(next)   — or double-Q: the
                     ONLINE net picks a*, the target net evaluates it
    loss             huber(q_sa − (r + γⁿ·(1−done)·boot)), mean over B
    backward         huber' = clamp(diff, ±1); relu' = (x > 0)
    Adam             optax.adam (no clip — DQNAgent.tx), per-tensor
    target sync      every ``sync_every`` updates the param tensors copy
                     into the target tensors IN-KERNEL (pl.when on the
                     update counter), target fold recomputed

Sampling is presampled OUTSIDE (this trainer's own documented protocol:
ONE ``randint(key, [U, B], 0, size)`` against the post-push ring — the
ring is constant across a chunk's updates for uniform replay, so one
gather materializes every update's batch). PER is PINNED out: priorities
mutate between updates, making the sample distribution sequential — the
XLA update path keeps it. Gradients are verified allclose against
``jax.grad`` of ``DQNAgent.td_loss`` through the trainer parity test
(tests/test_dqn_update_kernel.py).

Scope: uniform replay, table-net or plain-MLP DQN with two hidden layers,
single device; n-step arrives pre-windowed in the records (γⁿ is a
static), double-Q via a static flag.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import _interpret


def _row_sum(x):
    return jnp.sum(x, axis=1, keepdims=True)


def _kernel(S_pad, A, A_pad, H1, H2, n_sub, n_upd, mb_size, sub,
            lr, gamma_n, sync_every, double_q, b1m, b2m, eps_adam,
            # inputs: params, target params, mu, nu (6 tensors each)
            w1T_i, b1_i, W2T_i, b2_i, H3T_i, b3_i,
            tw1T_i, tb1_i, tW2T_i, tb2_i, tH3T_i, tb3_i,
            mu0, mu1, mu2, mu3, mu4, mu5,
            nu0, nu1, nu2, nu3, nu4, nu5,
            count0, nupd0, O2,
            sidx, nidx, act, rew, dne,
            # outputs
            w1T_o, b1_o, W2T_o, b2_o, H3T_o, b3_o,
            tw1T_o, tb1_o, tW2T_o, tb2_o, tH3T_o, tb3_o,
            muo0, muo1, muo2, muo3, muo4, muo5,
            nuo0, nuo1, nuo2, nuo3, nuo4, nuo5,
            count_o, nupd_o, loss_o,
            # scratch
            w1T, b1, W2T, b2, H3T, b3,
            tw1T, tb1, tW2T, tb2, tH3T, tb3,
            m0, m1, m2, m3, m4, m5,
            v0, v1, v2, v3, v4, v5,
            foldT, tfoldT, gfoldT, gb1, gW2T, gb2, gH3T, gb3, l_acc):
    g = pl.program_id(0)
    params = (w1T, b1, W2T, b2, H3T, b3)
    tparams = (tw1T, tb1, tW2T, tb2, tH3T, tb3)
    mus = (m0, m1, m2, m3, m4, m5)
    nus = (v0, v1, v2, v3, v4, v5)
    grads = (gfoldT, gb1, gW2T, gb2, gH3T, gb3)
    hi = jax.lax.Precision.HIGHEST

    def dot(a, b_, dims):
        return jax.lax.dot_general(
            a, b_, (dims, ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )

    def refold(dst, src_w1T):
        dst[:] = dot(src_w1T[:], O2[:], ((1,), (0,)))

    @pl.when(g == 0)
    def _():
        for dst, src in zip(
            params + tparams,
            (w1T_i, b1_i, W2T_i, b2_i, H3T_i, b3_i,
             tw1T_i, tb1_i, tW2T_i, tb2_i, tH3T_i, tb3_i),
        ):
            dst[:] = src[:]
        for dst, src in zip(mus, (mu0, mu1, mu2, mu3, mu4, mu5)):
            dst[:] = src[:]
        for dst, src in zip(nus, (nu0, nu1, nu2, nu3, nu4, nu5)):
            dst[:] = src[:]
        refold(foldT, w1T)
        refold(tfoldT, tw1T)
        l_acc[:] = jnp.zeros_like(l_acc)

    s_in_mb = jax.lax.rem(g, n_sub)

    @pl.when(s_in_mb == 0)
    def _():
        for ref in grads:
            ref[:] = jnp.zeros_like(ref)

    # ---- forward on the sampled batch (8-row stream blocks) --------------
    r = pl.ds(jax.lax.rem(g, 8), 1)
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (S_pad, sub), 0)
    ohS = (rows_s == sidx[r, :]).astype(jnp.float32)
    ohN = (rows_s == nidx[r, :]).astype(jnp.float32)

    def qnet(fold_ref, p, oh):
        w1T_, b1_, W2T_, b2_, H3T_, b3_ = p
        x1 = jnp.maximum(dot(fold_ref[:], oh, ((1,), (0,))) + b1_[:], 0.0)
        x2 = jnp.maximum(dot(W2T_[:], x1, ((1,), (0,))) + b2_[:], 0.0)
        return dot(H3T_[:], x2, ((1,), (0,))) + b3_[:], x1, x2

    q, x1, x2 = qnet(foldT, params, ohS)                    # [A_pad, SUB]
    tq, _, _ = qnet(tfoldT, tparams, ohN)

    masks = [(act[r, :] == a).astype(jnp.float32) for a in range(A)]
    q_sa = None
    for a in range(A):
        t_ = masks[a] * q[a : a + 1, :]
        q_sa = t_ if q_sa is None else q_sa + t_

    if double_q:
        qn_on, _, _ = qnet(foldT, params, ohN)
        m = qn_on[0:1, :]
        for a in range(1, A):
            m = jnp.maximum(m, qn_on[a : a + 1, :])
        astar = jnp.full_like(act[r, :], A - 1)
        for a in range(A - 2, -1, -1):
            astar = jnp.where(qn_on[a : a + 1, :] == m, a, astar)
        boot = None
        for a in range(A):
            t_ = (astar == a).astype(jnp.float32) * tq[a : a + 1, :]
            boot = t_ if boot is None else boot + t_
    else:
        boot = tq[0:1, :]
        for a in range(1, A):
            boot = jnp.maximum(boot, tq[a : a + 1, :])

    not_done = 1.0 - (dne[r, :] > 0).astype(jnp.float32)
    target = rew[r, :] + gamma_n * not_done * boot
    diff = q_sa - target
    # optax.huber_loss (delta=1): 0.5 d² inside, |d| − 0.5 outside.
    ad = jnp.abs(diff)
    hub = jnp.where(ad <= 1.0, 0.5 * diff * diff, ad - 0.5)
    inv_b = 1.0 / mb_size
    l_acc[:] = l_acc[:] + (inv_b * jnp.sum(hub)).reshape(1, 1)

    # ---- backward --------------------------------------------------------
    dq_sa = inv_b * jnp.clip(diff, -1.0, 1.0)               # huber'
    dq_rows = [masks[a] * dq_sa for a in range(A)]
    dq = jnp.concatenate(
        dq_rows + [jnp.zeros_like(dq_sa)] * (A_pad - A), axis=0
    )
    dx2 = dot(H3T[:], dq, ((0,), (0,)))
    dg2 = dx2 * (x2 > 0.0).astype(jnp.float32)
    dx1 = dot(W2T[:], dg2, ((0,), (0,)))
    df = dx1 * (x1 > 0.0).astype(jnp.float32)

    gH3T[:] = gH3T[:] + dot(dq, x2, ((1,), (1,)))
    gb3[:] = gb3[:] + _row_sum(dq)
    gW2T[:] = gW2T[:] + dot(dg2, x1, ((1,), (1,)))
    gb2[:] = gb2[:] + _row_sum(dg2)
    gfoldT[:] = gfoldT[:] + dot(df, ohS, ((1,), (1,)))
    gb1[:] = gb1[:] + _row_sum(df)

    # ---- Adam + target sync at each update's last sub-block --------------
    @pl.when(s_in_mb == n_sub - 1)
    def _():
        gw1T = dot(gfoldT[:], O2[:], ((1,), (1,)))
        gs = (gw1T, gb1[:], gW2T[:], gb2[:], gH3T[:], gb3[:])
        t_cnt = (count0[0, 0] + g // n_sub + 1).astype(jnp.float32)
        c1 = 1.0 - jnp.exp(t_cnt * math.log(b1m))
        c2 = 1.0 - jnp.exp(t_cnt * math.log(b2m))
        for p_ref, m_ref, v_ref, gt in zip(params, mus, nus, gs):
            m_new = b1m * m_ref[:] + (1.0 - b1m) * gt
            v_new = b2m * v_ref[:] + (1.0 - b2m) * gt * gt
            m_ref[:] = m_new
            v_ref[:] = v_new
            p_ref[:] = p_ref[:] - lr * (m_new / c1) / (
                jnp.sqrt(v_new / c2) + eps_adam
            )
        refold(foldT, w1T)
        n_upd_now = nupd0[0, 0] + g // n_sub + 1

        @pl.when(jax.lax.rem(n_upd_now, sync_every) == 0)
        def _():
            for dst, src in zip(tparams, params):
                dst[:] = src[:]
            refold(tfoldT, tw1T)

    @pl.when(g == n_upd * n_sub - 1)
    def _():
        for dst, src in zip(
            (w1T_o, b1_o, W2T_o, b2_o, H3T_o, b3_o,
             tw1T_o, tb1_o, tW2T_o, tb2_o, tH3T_o, tb3_o),
            params + tparams,
        ):
            dst[:] = src[:]
        for dst, src in zip((muo0, muo1, muo2, muo3, muo4, muo5), mus):
            dst[:] = src[:]
        for dst, src in zip((nuo0, nuo1, nuo2, nuo3, nuo4, nuo5), nus):
            dst[:] = src[:]
        count_o[0, 0] = count0[0, 0] + n_upd
        nupd_o[0, 0] = nupd0[0, 0] + n_upd
        loss_o[:] = l_acc[:] / n_upd


@functools.partial(jax.jit, static_argnums=(0,))
def dqn_update_run(static, tensors, ttensors, mu, nu, count0, nupd0, O2,
                   streams):
    """U fused TD updates. tensors/ttensors/mu/nu: 6-tuples (w1T [H1,D_pad],
    b1 [H1,1], W2T [H2,H1], b2 [H2,1], H3T [A_pad,H2], b3 [A_pad,1]);
    streams: (sidx, nidx, action, reward, done) [n_upd·n_sub (8-padded),
    SUB]. Returns (tensors', ttensors', mu', nu', count', nupd', loss)."""
    (S_pad, D_pad, A, A_pad, H1, H2, n_sub, n_upd, mb_size, sub,
     lr, gamma_n, sync_every, double_q, b1m, b2m, eps_adam) = static
    i32, f32 = jnp.int32, jnp.float32
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda g: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (8, sub), lambda g: (g // 8, 0), memory_space=pltpu.VMEM
    )
    shapes = [
        (H1, D_pad), (H1, 1), (H2, H1), (H2, 1), (A_pad, H2), (A_pad, 1)
    ]
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(
            _kernel, S_pad, A, A_pad, H1, H2, n_sub, n_upd, mb_size, sub,
            lr, gamma_n, sync_every, double_q, b1m, b2m, eps_adam,
        ),
        grid=(n_upd * n_sub,),
        in_specs=(
            [full(s) for s in shapes] * 4       # params, target, mu, nu
            + [smem(), smem()]                   # count0, nupd0
            + [full((D_pad, S_pad))]             # O2
            + [stream() for _ in range(5)]
        ),
        out_specs=(
            [full(s) for s in shapes] * 4
            + [smem(), smem(), full((1, 1))]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct(s, f32) for s in shapes] * 4
            + [jax.ShapeDtypeStruct((1, 1), i32),
               jax.ShapeDtypeStruct((1, 1), i32),
               jax.ShapeDtypeStruct((1, 1), f32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM(s, f32) for s in shapes] * 4
            + [pltpu.VMEM((H1, S_pad), f32),     # foldT
               pltpu.VMEM((H1, S_pad), f32),     # target foldT
               pltpu.VMEM((H1, S_pad), f32),     # gfoldT
               pltpu.VMEM((H1, 1), f32),
               pltpu.VMEM((H2, H1), f32),
               pltpu.VMEM((H2, 1), f32),
               pltpu.VMEM((A_pad, H2), f32),
               pltpu.VMEM((A_pad, 1), f32),
               pltpu.VMEM((1, 1), f32)]
        ),
        interpret=_interpret(),
    )(*tensors, *ttensors, *mu, *nu, count0, nupd0, O2, *streams)
    return (outs[:6], outs[6:12], outs[12:18], outs[18:24],
            outs[24], outs[25], outs[26])
