"""Fused pallas tabular-Q TRAINING kernel: act → env step → TD learn, all
inside one kernel for T steps.

The round-3/4 MXU tabular trainer (`training/tabular_mxu.py`) reduced every
phase to matmuls but still pays ~20 XLA kernel launches per scan iteration
(PERF.md MFU table names that launch floor as its roof: 32 M env-steps/s
single-dispatch). Here the whole loop lives in VMEM like the rollout kernel
(`ops/rollout_kernel.py`), lane-major on N throughout:

    qaT  [A, N]      = QT @ ohT_s              ε-greedy readout (MXU)
    greedy (1, N)    = first-max over A rows   (argmax tie rule preserved)
    yT   [A·F, N]    = W2 @ ohT_s              env step (MXU)
    qnT  [A, N]      = QT @ ohT_next           bootstrap readout (MXU)
    tdT  [A, S_pad]  = X @ ohT_sᵀ              scatter-accumulate as a
    cntT [A, S_pad]  = M @ ohT_sᵀ              lane-contraction matmul (MXU)
    QT  += lr · tdT / max(cntT, 1)             duplicate-averaged TD (VPU)

Same duplicate-averaged batched TD semantics as ``TabularQAgent.learn`` /
``_learn_matmul`` (pre-update Q for every TD error in the batch; float sums
in matmul association).

RNG protocol (documented deviation — this trainer's own draw contract, NOT
the MXU trainer's per-step split chain): per chunk, ONE key split into
(k_actions, k_uniform); ``randint(k_actions, [T, N])`` random actions and
``uniform(k_uniform, [T, N])`` exploration draws are presampled with
threefry OUTSIDE the kernel and streamed in; per step,
``explore = u_t < ε(step_t)`` with the same linear ε anneal, advancing the
global step counter by N per vector step. Learning outcomes are gated the
same way as the other trainers (shift optimum; tests/test_tabular_kernel.py).

Scope: deterministic-reset compiled envs, single lane block (N ≤ 4096) so
the TD batch covers all N lanes exactly like the XLA trainers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import N_FIELDS, TB, _interpret, _round_up


def _kernel(S_pad, A, A_pad, max_steps, reset_idx, n_t, n_envs,
            lr, discount, eps0, epsf, anneal,
            q0, idx0, t0, epr0, eph0, epl0, step0, w2, rand_a, u,
            q_o, idx_o, t_o, epr_o, eph_o, epl_o, step_o,
            eacc_o, racc_o, hacc_o, lacc_o,
            q_s, idx_s, t_s, epr_s, eph_s, epl_s,
            eacc_s, racc_s, hacc_s, lacc_s):
    j = pl.program_id(0)
    N = idx0.shape[1]
    F = N_FIELDS

    @pl.when(j == 0)
    def _():
        q_s[:] = q0[:]
        idx_s[:] = idx0[:]
        t_s[:] = t0[:]
        epr_s[:] = epr0[:]
        eph_s[:] = eph0[:]
        epl_s[:] = epl0[:]
        for ref in (eacc_s, racc_s, hacc_s, lacc_s):
            ref[:] = jnp.zeros_like(ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (S_pad, N), 0)
    w2_dtype = w2.dtype
    precision = (
        jax.lax.Precision.DEFAULT
        if w2_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    hi = jax.lax.Precision.HIGHEST

    def readout(q, ohT):
        """Exact per-lane Q rows: [A_pad, N] (padding rows read zeros)."""
        return jax.lax.dot_general(
            q, ohT.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=hi,
            preferred_element_type=jnp.float32,
        )

    def step(s, _):
        idx = idx_s[:]                                     # (1, N)
        ohT_s = (rows == idx)
        ohT_f = ohT_s.astype(jnp.float32)

        # -- ε-greedy act (first-max argmax, like jnp.argmax) --------------
        qa = readout(q_s[:], ohT_f)                        # [A_pad, N]
        m = qa[0:1, :]
        for a in range(1, A):
            m = jnp.maximum(m, qa[a : a + 1, :])
        greedy = jnp.full_like(idx, A - 1)
        for a in range(A - 2, -1, -1):
            greedy = jnp.where(qa[a : a + 1, :] == m, a, greedy)
        step_t = step0[0, 0] + (j * actions_per_block + s) * n_envs
        frac = jnp.clip(
            step_t.astype(jnp.float32) / anneal, 0.0, 1.0
        )
        eps_t = eps0 + frac * (epsf - eps0)
        explore = u[pl.ds(s, 1), :] < eps_t
        action = jnp.where(explore, rand_a[pl.ds(s, 1), :], greedy)

        # -- env step (rollout kernel's matmul payload) --------------------
        yT = jax.lax.dot_general(
            w2[:], ohT_s.astype(w2_dtype),
            (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        masks = [
            (action == a).astype(jnp.float32) for a in range(A)
        ]
        f = []
        for k in range(F):
            acc = None
            for a in range(A):
                term = yT[a * F + k : a * F + k + 1, :] * masks[a]
                acc = term if acc is None else acc + term
            f.append(acc)
        nxt_f, reward, hidden, done_f = f
        nxt = nxt_f.astype(jnp.int32)
        t = t_s[:] + 1
        done = (done_f > 0.5) | (t >= max_steps)
        done_x = done.astype(jnp.float32)

        # -- TD learn (duplicate-averaged; pre-update Q throughout) --------
        ohT_n = (rows == nxt).astype(jnp.float32)
        qn = readout(q_s[:], ohT_n)                        # [A_pad, N]
        boot = qn[0:1, :]
        for a in range(1, A):
            boot = jnp.maximum(boot, qn[a : a + 1, :])
        target = reward + discount * jnp.where(done, 0.0, boot)
        q_sa = None
        for a in range(A):
            term = qa[a : a + 1, :] * masks[a]
            q_sa = term if q_sa is None else q_sa + term
        td = target - q_sa                                  # (1, N)
        X = jnp.concatenate(
            [masks[a] * td for a in range(A)]
            + [jnp.zeros_like(td)] * (A_pad - A),
            axis=0,
        )                                                   # [A_pad, N]
        M = jnp.concatenate(
            masks + [jnp.zeros_like(td)] * (A_pad - A), axis=0
        )
        td_sum = jax.lax.dot_general(                       # [A_pad, S_pad]
            X, ohT_f, (((1,), (1,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )
        cnt = jax.lax.dot_general(
            M, ohT_f, (((1,), (1,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )
        q_s[:] = q_s[:] + lr * td_sum / jnp.maximum(cnt, 1.0)

        # -- episode accounting + auto-reset -------------------------------
        epr = epr_s[:] + reward
        eph = eph_s[:] + hidden
        epl = epl_s[:] + 1
        eacc_s[:] = eacc_s[:] + done_x
        racc_s[:] = racc_s[:] + done_x * epr
        hacc_s[:] = hacc_s[:] + done_x * eph
        lacc_s[:] = lacc_s[:] + done_x * epl.astype(jnp.float32)
        idx_s[:] = jnp.where(done, reset_idx, nxt)
        t_s[:] = jnp.where(done, 0, t)
        epr_s[:] = jnp.where(done, 0.0, epr)
        eph_s[:] = jnp.where(done, 0.0, eph)
        epl_s[:] = jnp.where(done, 0, epl)
        return 0

    actions_per_block = rand_a.shape[0]
    jax.lax.fori_loop(0, actions_per_block, step, 0)

    @pl.when(j == n_t - 1)
    def _():
        q_o[:] = q_s[:]
        idx_o[:] = idx_s[:]
        t_o[:] = t_s[:]
        epr_o[:] = epr_s[:]
        eph_o[:] = eph_s[:]
        epl_o[:] = epl_s[:]
        step_o[0, 0] = step0[0, 0] + n_t * actions_per_block * n_envs
        eacc_o[:] = eacc_s[:]
        racc_o[:] = racc_s[:]
        hacc_o[:] = hacc_s[:]
        lacc_o[:] = lacc_s[:]


@functools.partial(jax.jit, static_argnums=(0,))
def tabq_run(static, w2, qT, state, step0, rand_a, u):
    (S_pad, A, A_pad, max_steps, reset_idx,
     lr, discount, eps0, epsf, anneal) = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = rand_a.shape
    tb = TB
    while T % tb:
        tb //= 2
    assert tb >= 1
    n_t = T // tb
    AF = A * N_FIELDS
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, N), lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    i32, f32 = jnp.int32, jnp.float32
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel, S_pad, A, A_pad, max_steps, reset_idx, n_t, N,
            lr, discount, eps0, epsf, anneal,
        ),
        grid=(n_t,),
        in_specs=[
            full((A_pad, S_pad)),   # qT
            row(), row(), row(), row(), row(),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # step0 (1,)
            full((AF, S_pad)),      # payload
            pl.BlockSpec((tb, N), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            [full((A_pad, S_pad))]
            + [row() for _ in range(5)]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [row() for _ in range(4)]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((A_pad, S_pad), f32)]
            + [jax.ShapeDtypeStruct((1, N), d)
               for d in (i32, i32, f32, f32, i32)]
            + [jax.ShapeDtypeStruct((1, 1), i32)]
            + [jax.ShapeDtypeStruct((1, N), f32) for _ in range(4)]
        ),
        scratch_shapes=[
            pltpu.VMEM((A_pad, S_pad), f32),   # Q
            pltpu.VMEM((1, N), i32),           # idx
            pltpu.VMEM((1, N), i32),           # t
            pltpu.VMEM((1, N), f32),           # ep_return
            pltpu.VMEM((1, N), f32),           # ep_hidden
            pltpu.VMEM((1, N), i32),           # ep_len
            pltpu.VMEM((1, N), f32),           # episodes acc
            pltpu.VMEM((1, N), f32),           # finished return acc
            pltpu.VMEM((1, N), f32),           # finished hidden acc
            pltpu.VMEM((1, N), f32),           # finished length acc
        ],
        interpret=_interpret(),
    )(qT, idx0, t0, epr0, eph0, epl0, step0, w2, rand_a, u)
    return outs
