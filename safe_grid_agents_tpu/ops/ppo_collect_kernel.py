"""Fused pallas PPO COLLECT kernel: sample-act → env step → rollout
records, all inside one kernel for T steps (round 5).

With the optimize phase fused (`ops/ppo_kernel.py`), the MXU-PPO chunk's
binding wall moves back to collect: T scan iterations of policy forward +
env step + record, each a handful of XLA launches. The same frozen-params
collapse as the DQN collect kernel (`ops/dqn_kernel.py`) applies — during
a collect chunk the table-net policy is a pure function of the state
index — so the whole actor evaluates ONCE per chunk into payload rows:

    per action a:  next_hi, next_lo, reward, hidden, done   (env step)
    A rows:        logp[a]      (log-softmax of the frozen logits)
    A−1 rows:      cdf[a]       (cumulative softmax probabilities)
    1 row:         value

and in-kernel acting is inverse-CDF sampling against a presampled uniform:
``a = Σ_{k<A−1} (u ≥ cdf[k])`` — this engine's OWN documented draw
protocol (ONE ``uniform(key, [T, N])`` per chunk; NOT
``jax.random.categorical``'s Gumbel trick, same per-state distribution),
host-replay-gated like every fused kernel here. The payload is ONE
f32-HIGHEST matmul per step (policy rows are arbitrary floats, so no bf16
path; one-hot dots of f32 values are exact → the replay is bitwise).

Records stream out per T-block: pre_idx, pre_t, action, logp, value,
observed reward, hidden reward, done, next_idx — everything
``MXUPPOTrainer.collect`` records (incl. the CRMDP fields). Episode stats
accumulate in VMEM like the rollout kernel.

Scope: deterministic-reset compiled envs with a table-net policy (the
fused-PPO config), single device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import _interpret

TB_P = 16  # T-block: 9 record streams + 1 uniform stream live per block
F_E = 5    # env fields per action: next_hi, next_lo, reward, hidden, done


def _kernel(S_pad, A, max_steps, reset_idx, n_t,
            idx0, t0, epr0, eph0, epl0, w, u,
            idx_o, t_o, epr_o, eph_o, epl_o,
            eacc_o, racc_o, hacc_o, lacc_o,
            pidx_r, pt_r, act_r, logp_r, val_r, rew_r, hid_r, done_r, nidx_r,
            idx_s, t_s, epr_s, eph_s, epl_s,
            eacc_s, racc_s, hacc_s, lacc_s):
    j = pl.program_id(1)
    N = idx0.shape[1]

    @pl.when(j == 0)
    def _():
        idx_s[:] = idx0[:]
        t_s[:] = t0[:]
        epr_s[:] = epr0[:]
        eph_s[:] = eph0[:]
        epl_s[:] = epl0[:]
        for ref in (eacc_s, racc_s, hacc_s, lacc_s):
            ref[:] = jnp.zeros_like(ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (S_pad, N), 0)
    # Row map: [0, A·F_E) env fields; then A logp rows; then A−1 cdf rows;
    # then the value row.
    LOGP0 = A * F_E
    CDF0 = LOGP0 + A
    VAL = CDF0 + (A - 1)

    def step(s, _):
        idx = idx_s[:]
        ohT = (rows == idx).astype(jnp.float32)
        yT = jax.lax.dot_general(
            w[:], ohT, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        ds = pl.ds(s, 1)
        uu = u[ds, :]                                       # (1, N)
        action = jnp.zeros_like(idx)
        for k in range(A - 1):
            action = action + (
                uu >= yT[CDF0 + k : CDF0 + k + 1, :]
            ).astype(jnp.int32)
        masks = [(action == a).astype(jnp.float32) for a in range(A)]
        logp = None
        for a in range(A):
            t_ = masks[a] * yT[LOGP0 + a : LOGP0 + a + 1, :]
            logp = t_ if logp is None else logp + t_
        value = yT[VAL : VAL + 1, :]

        f = []
        for k in range(F_E):
            acc = None
            for a in range(A):
                term = yT[a * F_E + k : a * F_E + k + 1, :] * masks[a]
                acc = term if acc is None else acc + term
            f.append(acc)
        nxt = f[0].astype(jnp.int32) * 256 + f[1].astype(jnp.int32)
        reward, hidden, done_f = f[2], f[3], f[4]
        t = t_s[:] + 1
        done = (done_f > 0.5) | (t >= max_steps)
        done_x = done.astype(jnp.float32)

        pidx_r[ds, :] = idx
        pt_r[ds, :] = t_s[:]
        act_r[ds, :] = action
        logp_r[ds, :] = logp
        val_r[ds, :] = value
        rew_r[ds, :] = reward
        hid_r[ds, :] = hidden
        done_r[ds, :] = done.astype(jnp.int32)
        nidx_r[ds, :] = nxt

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

    jax.lax.fori_loop(0, u.shape[0], step, 0)

    @pl.when(j == n_t - 1)
    def _():
        idx_o[:] = idx_s[:]
        t_o[:] = t_s[:]
        epr_o[:] = epr_s[:]
        eph_o[:] = eph_s[:]
        epl_o[:] = epl_s[:]
        eacc_o[:] = eacc_s[:]
        racc_o[:] = racc_s[:]
        hacc_o[:] = hacc_s[:]
        lacc_o[:] = lacc_s[:]


@functools.partial(jax.jit, static_argnums=(0,))
def ppo_collect_run(static, w, state, u):
    """One fused collect chunk. ``w`` = [A·F_E + 2A, S_pad] payload with
    the per-chunk policy rows appended (logp, cdf, value — trainer builds
    them from the frozen params)."""
    (S_pad, A, max_steps, reset_idx, nb) = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = u.shape
    if T % TB_P:
        raise ValueError(f"chunk steps {T} must be a multiple of {TB_P}")
    if N % nb:
        raise ValueError(f"lane count {N} not a multiple of lane block {nb}")
    n_lane, n_t = N // nb, T // TB_P
    rows_w = A * F_E + 2 * A  # + A logp + (A−1) cdf + 1 value
    i32, f32 = jnp.int32, jnp.float32
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, nb), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (TB_P, nb), lambda i, j: (j, i), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, S_pad, A, max_steps, reset_idx, n_t),
        grid=(n_lane, n_t),
        in_specs=[
            row(), row(), row(), row(), row(),
            pl.BlockSpec((rows_w, S_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            stream(),  # uniforms
        ],
        out_specs=(
            [row() for _ in range(9)] + [stream() for _ in range(9)]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((1, N), d)
             for d in (i32, i32, f32, f32, i32)]
            + [jax.ShapeDtypeStruct((1, N), f32) for _ in range(4)]
            + [jax.ShapeDtypeStruct((T, N), d)
               for d in (i32, i32, i32, f32, f32, f32, f32, i32, i32)]
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nb), i32), pltpu.VMEM((1, nb), i32),
            pltpu.VMEM((1, nb), f32), pltpu.VMEM((1, nb), f32),
            pltpu.VMEM((1, nb), i32),
            pltpu.VMEM((1, nb), f32), pltpu.VMEM((1, nb), f32),
            pltpu.VMEM((1, nb), f32), pltpu.VMEM((1, nb), f32),
        ],
        interpret=_interpret(),
    )(idx0, t0, epr0, eph0, epl0, w, u)
    return outs
