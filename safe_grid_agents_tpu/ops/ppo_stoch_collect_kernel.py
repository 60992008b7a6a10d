"""Fused pallas PPO COLLECT kernel for STOCHASTIC compiled envs (round-5
closing): `ops/ppo_collect_kernel.py`'s inverse-CDF sample-act → env step
→ record loop composed with `ops/stoch_rollout_kernel.py`'s mechanics, so
``--fused-kernel`` ppo-mlp --table-net runs BOTH phases in kernels on
every compiled alias — the last fused-collect fallback
(``training/ppo_pallas.py``'s "stochastic envs keep the XLA collect")
falls away.

Mechanics, identical to the other stochastic kernels:

* **coin reset** (absent/interrupt): presampled bit stream selects
  between the two probed reset states;
* **carried coin reset** (friend family): candidate fields ride the
  payload (hi/lo-split), the bit stream picks per lane;
* **action noise** (whisky): drunk-flag payload row + presampled
  stumble/rand streams form the EFFECTIVE action that steps the env —
  the record stores the CHOSEN action and ITS logp, exactly like
  ``MXUPPOTrainer.collect`` (agent.sample_action before vec.step);
* **index drying** (tomato): the policy rows (logp / inverse-CDF /
  value) are read at the PRE-dry index the agent observed, the env
  payload matmul runs on the DRIED index (elementwise bit-clear of the
  packed masks riding the ``bits`` stream — stoch_rollout_kernel module
  doc).

RNG protocol (this trainer's own documented contract): per chunk ONE key
splits FOUR ways (k_u, k_bits, k_stumble, k_rand) — action uniforms,
reset coins / packed dry masks, stumble coins, stumble actions — all
presampled [T, N] and streamed per T-block. The payload is f32 HIGHEST
(policy rows are arbitrary floats; one-hot dots of f32 values are exact,
so the NumPy host replay is bitwise). Gates:
tests/test_ppo_stoch_collect_kernel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import _interpret

TB_PS = 16  # 9 record + 4 draw streams live per T-block


def _kernel(S_pad, A, F, max_steps, mode, r0, r1, has_noise, dry_nbits,
            n_t,
            idx0, t0, epr0, eph0, epl0, w, u, bits, stumble, rand_a,
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
    # Row map: [0, A·F) env fields; optional drunk row; A logp rows;
    # A−1 cdf rows; the value row.
    DRUNK = A * F
    LOGP0 = A * F + (1 if has_noise else 0)
    CDF0 = LOGP0 + A
    VAL = CDF0 + (A - 1)
    hi = jax.lax.Precision.HIGHEST

    def step(s, _):
        idx = idx_s[:]
        ds = pl.ds(s, 1)
        if dry_nbits:
            # Policy rows at the PRE-dry index (what the agent observed —
            # and what the rollout records store); env fields at the
            # DRIED index. Two one-hots, zero gathers.
            ohT_pre = (rows == idx).astype(jnp.float32)
            pT = jax.lax.dot_general(
                w[LOGP0 : VAL + 1, :], ohT_pre, (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32,
            )
            dried = idx - (idx & ((1 << dry_nbits) - 1) & bits[ds, :])
            ohT = (rows == dried).astype(jnp.float32)
            yT = jax.lax.dot_general(
                w[:], ohT, (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32,
            )
            prow = lambda k: pT[k : k + 1, :]            # noqa: E731
        else:
            ohT = (rows == idx).astype(jnp.float32)
            yT = jax.lax.dot_general(
                w[:], ohT, (((1,), (0,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32,
            )
            prow = lambda k: yT[LOGP0 + k : LOGP0 + k + 1, :]  # noqa: E731

        uu = u[ds, :]
        action = jnp.zeros_like(idx)
        for k in range(A - 1):
            action = action + (
                uu >= prow(A + k)                         # cdf rows
            ).astype(jnp.int32)
        masks_c = [(action == a).astype(jnp.float32) for a in range(A)]
        logp = None
        for a in range(A):
            t_ = masks_c[a] * prow(a)
            logp = t_ if logp is None else logp + t_
        value = prow(2 * A - 1)

        if has_noise:
            drunk = yT[DRUNK : DRUNK + 1, :] > 0.5
            eff = jnp.where(
                drunk & (stumble[ds, :] > 0), rand_a[ds, :], action
            )
            masks_e = [(eff == a).astype(jnp.float32) for a in range(A)]
        else:
            masks_e = masks_c
        f = []
        for k in range(F):
            acc = None
            for a in range(A):
                term = yT[a * F + k : a * F + k + 1, :] * masks_e[a]
                acc = term if acc is None else acc + term
            f.append(acc)
        nxt = f[0].astype(jnp.int32) * 256 + f[1].astype(jnp.int32)
        reward, hidden, done_f = f[2], f[3], f[4]
        t = t_s[:] + 1
        done = (done_f > 0.5) | (t >= max_steps)
        done_x = done.astype(jnp.float32)

        pidx_r[ds, :] = idx
        pt_r[ds, :] = t_s[:]
        act_r[ds, :] = action                                 # chosen
        logp_r[ds, :] = logp
        val_r[ds, :] = value
        rew_r[ds, :] = reward
        hid_r[ds, :] = hidden
        done_r[ds, :] = done.astype(jnp.int32)
        nidx_r[ds, :] = nxt

        if mode == 1:
            reset_lane = jnp.where(
                bits[ds, :] > 0, jnp.int32(r1), jnp.int32(r0)
            )
        elif mode == 2:
            c0 = f[5].astype(jnp.int32) * 256 + f[6].astype(jnp.int32)
            c1 = f[7].astype(jnp.int32) * 256 + f[8].astype(jnp.int32)
            reset_lane = jnp.where(bits[ds, :] > 0, c1, c0)
        else:
            reset_lane = jnp.full_like(idx, r0)

        epr = epr_s[:] + reward
        eph = eph_s[:] + hidden
        epl = epl_s[:] + 1
        eacc_s[:] = eacc_s[:] + done_x
        racc_s[:] = racc_s[:] + done_x * epr
        hacc_s[:] = hacc_s[:] + done_x * eph
        lacc_s[:] = lacc_s[:] + done_x * epl.astype(jnp.float32)
        idx_s[:] = jnp.where(done, reset_lane, nxt)
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
def ppo_stoch_collect_run(static, w, state, u, bits, stumble, rand_a):
    """One fused stochastic PPO collect chunk. ``w`` = [A·F (+drunk) + 2A,
    S_pad] f32 payload with the per-chunk policy rows LAST (logp, cdf,
    value)."""
    (S_pad, A, F, max_steps, mode, r0, r1, has_noise, dry_nbits,
     nb) = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = u.shape
    if T % TB_PS:
        raise ValueError(f"chunk steps {T} must be a multiple of {TB_PS}")
    if N % nb:
        raise ValueError(f"lane count {N} not a multiple of lane block {nb}")
    n_lane, n_t = N // nb, T // TB_PS
    rows_w = A * F + (1 if has_noise else 0) + 2 * A
    i32, f32 = jnp.int32, jnp.float32
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, nb), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (TB_PS, nb), lambda i, j: (j, i), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel, S_pad, A, F, max_steps, mode, r0, r1, has_noise,
            dry_nbits, n_t,
        ),
        grid=(n_lane, n_t),
        in_specs=[
            row(), row(), row(), row(), row(),
            pl.BlockSpec((rows_w, S_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            stream(), stream(), stream(), stream(),
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
    )(idx0, t0, epr0, eph0, epl0, w, u, bits, stumble, rand_a)
    return outs
