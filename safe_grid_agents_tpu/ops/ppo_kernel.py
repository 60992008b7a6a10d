"""Fused pallas PPO OPTIMIZE kernel: the whole epochs × minibatches update
phase in ONE kernel, with params and Adam moments resident in VMEM
(round 5, VERDICT r4 next #2).

PERF.md's round-3 decomposition pins the MXU-PPO optimize phase at
~1.3 ms/update of kernel-boundary latency against ~0.3 ms of matmul — the
XLA minibatch scan re-launches ~10 kernels per update. Here ONE
``pallas_call`` runs every update: the grid is (updates × sub-blocks);
each grid step streams a SUB-lane slice of the minibatch through a
hand-derived forward/backward of the table-folded actor-critic
(`agents/networks.py::make_table_actor_critic`, hidden=(H1, H2)) and
accumulates gradients in VMEM scratch; at each minibatch's last sub-block
the kernel applies global-norm clip + Adam (the same
``optax.chain(clip_by_global_norm, adam)`` math, per-tensor — elementwise,
so grouping does not change the floats beyond association) and re-folds
``foldT = w1ᵀ @ Oᵀ`` so the next update acts on fresh params.

All activations are lane-major [feature, SUB]; the fold trick makes the
obs render + first layer ONE [H1, S_pad] @ [S_pad, SUB] matmul against the
one-hot (built transposed via broadcasted_iota like every kernel here).
The two heads (logits + value) fuse into one [A_pad, H2] tensor whose row
A is the value head — one head matmul, zero pad rows stay zero through
Adam (their grads are identically 0).

Gradient formulas (standard, verified against ``jax.grad`` of
``PPOAgent.loss`` to float tolerance in tests/test_ppo_kernel.py):

    dL/dlogits = -(1/B)·∂surr/∂logp_a·(1_a − p) − c_e·(1/B)·(−p·(logp + H))
    ∂surr/∂logp_a = ratio·adv·[unclipped branch | ratio in clip band]
    dL/dv = c_v·(1/B)·(v − returns)

Minibatch membership is EXACTLY ``MXUPPOTrainer.optimize_fast``'s tile
shuffle: the caller pre-applies the same per-epoch tile permutations
(same ``fold_in(key, e)`` draws) and passes the epochs-stacked flat
streams; the kernel slices contiguous sub-blocks. Differences from the
XLA optimize are float association only (matmul tiling, per-tensor global
norm partial sums) — pinned by an allclose parity test, with learning
gates through the trainer.

Scope: ``net='table'`` actor-critic with two hidden layers (the fast-path
bench config), single device. Reference counterpart: SURVEY.md §3.2
ppo_learn update phase (torch loss.backward()); nothing kernel-like exists
there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import _interpret


def _row_sum(x):
    """[R, SUB] → [R, 1] lane reduction."""
    return jnp.sum(x, axis=1, keepdims=True)


def _kernel(S_pad, A, A_pad, H1, H2, n_sub, n_upd, mb_size, sub,
            lr, clipping, value_coef, max_norm, b1m, b2m, eps_adam,
            # inputs
            w1T_i, b1_i, W2T_i, b2_i, H3T_i, b3_i,
            mu0, mu1, mu2, mu3, mu4, mu5,
            nu0, nu1, nu2, nu3, nu4, nu5,
            count0, ce, O2,
            sidx, act, olp, adv, ret,
            # outputs
            w1T_o, b1_o, W2T_o, b2_o, H3T_o, b3_o,
            muo0, muo1, muo2, muo3, muo4, muo5,
            nuo0, nuo1, nuo2, nuo3, nuo4, nuo5,
            count_o, loss_o,
            # scratch
            w1T, b1, W2T, b2, H3T, b3,
            m0, m1, m2, m3, m4, m5,
            v0, v1, v2, v3, v4, v5,
            foldT, gfoldT, gb1, gW2T, gb2, gH3T, gb3, l_acc):
    g = pl.program_id(0)
    params = (w1T, b1, W2T, b2, H3T, b3)
    mus = (m0, m1, m2, m3, m4, m5)
    nus = (v0, v1, v2, v3, v4, v5)
    grads = (gfoldT, gb1, gW2T, gb2, gH3T, gb3)  # gfoldT → gw1T at update

    @pl.when(g == 0)
    def _():
        for dst, src in zip(params, (w1T_i, b1_i, W2T_i, b2_i, H3T_i, b3_i)):
            dst[:] = src[:]
        for dst, src in zip(mus, (mu0, mu1, mu2, mu3, mu4, mu5)):
            dst[:] = src[:]
        for dst, src in zip(nus, (nu0, nu1, nu2, nu3, nu4, nu5)):
            dst[:] = src[:]
        foldT[:] = jax.lax.dot_general(
            w1T[:], O2[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        l_acc[:] = jnp.zeros_like(l_acc)

    s_in_mb = jax.lax.rem(g, n_sub)

    @pl.when(s_in_mb == 0)
    def _():
        for ref in grads:
            ref[:] = jnp.zeros_like(ref)

    hi = jax.lax.Precision.HIGHEST

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )

    # ---- forward (lane-major [feature, SUB]) -----------------------------
    # Streams arrive in 8-row blocks (Mosaic needs sublane-divisible block
    # shapes); this grid step's row is g % 8 within block g // 8.
    r = pl.ds(jax.lax.rem(g, 8), 1)
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (S_pad, sub), 0)
    ohT = (rows_s == sidx[r, :]).astype(jnp.float32)       # [S_pad, SUB]
    x1 = jnp.tanh(dot(foldT[:], ohT, ((1,), (0,))) + b1[:])  # [H1, SUB]
    x2 = jnp.tanh(dot(W2T[:], x1, ((1,), (0,))) + b2[:])     # [H2, SUB]
    y = dot(H3T[:], x2, ((1,), (0,))) + b3[:]                # [A_pad, SUB]
    v = y[A : A + 1, :]                                      # value row

    m = y[0:1, :]
    for a in range(1, A):
        m = jnp.maximum(m, y[a : a + 1, :])
    z = None
    for a in range(A):
        e = jnp.exp(y[a : a + 1, :] - m)
        z = e if z is None else z + e
    log_z = m + jnp.log(z)

    masks = [(act[r, :] == a).astype(jnp.float32) for a in range(A)]
    logp_rows = [y[a : a + 1, :] - log_z for a in range(A)]
    p_rows = [jnp.exp(lp) for lp in logp_rows]
    logp_a = None
    for a in range(A):
        t = masks[a] * logp_rows[a]
        logp_a = t if logp_a is None else logp_a + t

    ratio = jnp.exp(logp_a - olp[r, :])
    clip_r = jnp.clip(ratio, 1.0 - clipping, 1.0 + clipping)
    advv = adv[r, :]
    surr1 = ratio * advv
    surr2 = clip_r * advv
    surr = jnp.minimum(surr1, surr2)
    diff = v - ret[r, :]
    ent = None
    for a in range(A):
        t = -p_rows[a] * logp_rows[a]
        ent = t if ent is None else ent + t
    ce_t = ce[0, 0]
    inv_b = 1.0 / mb_size
    l_acc[:] = l_acc[:] + (inv_b * jnp.sum(
        -surr + value_coef * 0.5 * diff * diff - ce_t * ent
    )).reshape(1, 1)

    # ---- backward --------------------------------------------------------
    in_band = ((ratio >= 1.0 - clipping) & (ratio <= 1.0 + clipping)).astype(
        jnp.float32
    )
    active = jnp.where(surr1 <= surr2, 1.0, in_band)
    dlogp_a = -inv_b * active * ratio * advv               # ∂(−surr)/∂logp_a
    dv = value_coef * inv_b * diff                          # [1, SUB]
    dl_rows = []
    for a in range(A):
        d_pol = dlogp_a * (masks[a] - p_rows[a])
        d_ent = p_rows[a] * (logp_rows[a] + ent)            # −∂H/∂l_a
        dl_rows.append(d_pol + ce_t * inv_b * d_ent)
    dl = jnp.concatenate(
        dl_rows + [dv] + [jnp.zeros_like(dv)] * (A_pad - A - 1), axis=0
    )                                                       # [A_pad, SUB]

    dx2 = dot(H3T[:], dl, ((0,), (0,)))                     # [H2, SUB]
    dg2 = dx2 * (1.0 - x2 * x2)
    dx1 = dot(W2T[:], dg2, ((0,), (0,)))                    # [H1, SUB]
    df = dx1 * (1.0 - x1 * x1)

    gH3T[:] = gH3T[:] + dot(dl, x2, ((1,), (1,)))           # [A_pad, H2]
    gb3[:] = gb3[:] + _row_sum(dl)
    gW2T[:] = gW2T[:] + dot(dg2, x1, ((1,), (1,)))          # [H2, H1]
    gb2[:] = gb2[:] + _row_sum(dg2)
    gfoldT[:] = gfoldT[:] + dot(df, ohT, ((1,), (1,)))      # [H1, S_pad]
    gb1[:] = gb1[:] + _row_sum(df)

    # ---- clip + Adam + re-fold at each minibatch's last sub-block --------
    @pl.when(s_in_mb == n_sub - 1)
    def _():
        gw1T = dot(gfoldT[:], O2[:], ((1,), (1,)))          # [H1, D_pad]
        gs = (gw1T, gb1[:], gW2T[:], gb2[:], gH3T[:], gb3[:])
        gn2 = None
        for gt in gs:
            t = jnp.sum(gt * gt)
            gn2 = t if gn2 is None else gn2 + t
        gn = jnp.sqrt(gn2)
        scale = jnp.where(gn > max_norm, max_norm / gn, 1.0)
        # Bias correction: b**t as exp(t·log b) — Mosaic has no powf, and
        # log(β) folds to a trace-time constant (≤1 ulp vs optax's pow at
        # these magnitudes; inside the parity test's tolerance).
        import math as _math

        t_cnt = (count0[0, 0] + g // n_sub + 1).astype(jnp.float32)
        c1 = 1.0 - jnp.exp(t_cnt * _math.log(b1m))
        c2 = 1.0 - jnp.exp(t_cnt * _math.log(b2m))
        for p_ref, m_ref, v_ref, gt in zip(params, mus, nus, gs):
            gc = gt * scale
            m_new = b1m * m_ref[:] + (1.0 - b1m) * gc
            v_new = b2m * v_ref[:] + (1.0 - b2m) * gc * gc
            m_ref[:] = m_new
            v_ref[:] = v_new
            p_ref[:] = p_ref[:] - lr * (m_new / c1) / (
                jnp.sqrt(v_new / c2) + eps_adam
            )
        foldT[:] = jax.lax.dot_general(
            w1T[:], O2[:], (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )

    @pl.when(g == n_upd * n_sub - 1)
    def _():
        for dst, src in zip(
            (w1T_o, b1_o, W2T_o, b2_o, H3T_o, b3_o), params
        ):
            dst[:] = src[:]
        for dst, src in zip((muo0, muo1, muo2, muo3, muo4, muo5), mus):
            dst[:] = src[:]
        for dst, src in zip((nuo0, nuo1, nuo2, nuo3, nuo4, nuo5), nus):
            dst[:] = src[:]
        count_o[0, 0] = count0[0, 0] + n_upd
        loss_o[:] = l_acc[:] / n_upd


@functools.partial(jax.jit, static_argnums=(0,))
def ppo_optimize_run(static, tensors, mu, nu, count0, ce, O2, streams):
    """One fused optimize phase.

    tensors / mu / nu: 6-tuples (w1T [H1,D_pad], b1 [H1,1], W2T [H2,H1],
    b2 [H2,1], H3T [A_pad,H2] — row A is the value head, b3 [A_pad,1]).
    streams: 5-tuple of [n_upd·n_sub, SUB] epoch-stacked permuted flats
    (state idx i32, action i32, old_logp, advantages, returns).
    Returns (tensors', mu', nu', count', loss_mean [1,1])."""
    (S_pad, D_pad, A, A_pad, H1, H2, n_sub, n_upd, mb_size, sub,
     lr, clipping, value_coef, max_norm, b1m, b2m, eps_adam) = static
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
            lr, clipping, value_coef, max_norm, b1m, b2m, eps_adam,
        ),
        grid=(n_upd * n_sub,),
        in_specs=(
            [full(s) for s in shapes] * 3            # params, mu, nu
            + [smem(), smem()]                        # count0, ce
            + [full((D_pad, S_pad))]                  # O2
            + [stream() for _ in range(5)]
        ),
        out_specs=(
            [full(s) for s in shapes] * 3
            + [smem(), full((1, 1))]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct(s, f32) for s in shapes] * 3
            + [jax.ShapeDtypeStruct((1, 1), i32),
               jax.ShapeDtypeStruct((1, 1), f32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM(s, f32) for s in shapes] * 3   # params, mu, nu
            + [pltpu.VMEM((H1, S_pad), f32)]           # foldT
            + [pltpu.VMEM((H1, S_pad), f32),           # gfoldT
               pltpu.VMEM((H1, 1), f32),
               pltpu.VMEM((H2, H1), f32),
               pltpu.VMEM((H2, 1), f32),
               pltpu.VMEM((A_pad, H2), f32),
               pltpu.VMEM((A_pad, 1), f32)]
            + [pltpu.VMEM((1, 1), f32)]                # loss acc
        ),
        interpret=_interpret(),
    )(*tensors, *mu, *nu, count0, ce, O2, *streams)
    return outs[:6], outs[6:12], outs[12:18], outs[18], outs[19]
