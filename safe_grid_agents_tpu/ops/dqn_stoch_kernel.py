"""Fused pallas DQN COLLECT kernel for STOCHASTIC compiled envs (round 5):
`ops/dqn_kernel.py`'s record-streaming collect composed with
`ops/stoch_rollout_kernel.py`'s mechanics, so ``--fused-kernel`` deep-q
covers absent / interrupt / whisky (and, mechanically, the friend family)
too.

Per step: ε-greedy act off the frozen-params greedy payload row (the
CHOSEN action — what the replay records store, exactly like the base
trainers on noisy envs), whisky's stumble applied to form the EFFECTIVE
action that steps the env (drunk-flag payload row + presampled stumble /
rand streams), coin or carried-coin reset select, transition records
streamed out per T-block. hi/lo-split payload keeps the matmul bf16-exact.

RNG protocol (this trainer's own documented contract): per chunk ONE key
splits FIVE ways (k_rand, k_u, k_bits, k_stumble, k_rand2) — exploration
actions, exploration uniforms, reset coins (or packed per-tomato
``bernoulli(DRY_PROB)`` dry masks for drying envs — stoch_rollout_kernel
module doc), stumble coins, stumble actions — presampled [T, N] and
streamed.

tomato's drying (round-5 closing) keeps the base trainers' replay
semantics: the greedy action is read at the PRE-dry index the agent
observed (a 1-row payload dot on the pre-dry one-hot) and the replay
record stores that pre-dry index as the transition's state, while the
env payload matmul runs on the DRIED index (elementwise bit-clear —
stoch_rollout_kernel module doc). Host-replay equivalence:
tests/test_dqn_kernel.py stochastic legs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import _interpret

TB_DS = 16  # 6 record + 5 draw streams live per T-block


def _kernel(S_pad, A, F, max_steps, mode, r0, r1, has_noise, dry_nbits,
            n_lane, n_t, n_total, eps0, epsf, anneal, use_hidden,
            idx0, t0, epr0, eph0, epl0, step0, w,
            rand_a, u, bits, stumble, rand2,
            idx_o, t_o, epr_o, eph_o, epl_o, step_o,
            eacc_o, racc_o, hacc_o, lacc_o,
            pidx_r, pt_r, act_r, rew_r, nidx_r, done_r,
            idx_s, t_s, epr_s, eph_s, epl_s,
            eacc_s, racc_s, hacc_s, lacc_s):
    i = pl.program_id(0)
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
    w_dtype = w.dtype
    precision = (
        jax.lax.Precision.DEFAULT
        if w_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    GREEDY = A * F + (1 if has_noise else 0)

    def step(s, _):
        idx = idx_s[:]
        ds = pl.ds(s, 1)
        if dry_nbits:
            # Drying (module doc): greedy row read at the PRE-dry index
            # (what the agent observed — and what the record stores); the
            # full payload matmul runs on the DRIED index.
            ohT_pre = (rows == idx).astype(w_dtype)
            g_f = jax.lax.dot_general(
                w[GREEDY : GREEDY + 1, :], ohT_pre, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
            )
            greedy = g_f.astype(jnp.int32)
            dried = idx - (idx & ((1 << dry_nbits) - 1) & bits[ds, :])
            ohT = (rows == dried).astype(w_dtype)
        else:
            ohT = (rows == idx).astype(w_dtype)
        yT = jax.lax.dot_general(
            w[:], ohT, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        if not dry_nbits:
            greedy = yT[GREEDY : GREEDY + 1, :].astype(jnp.int32)
        step_t = step0[0, 0] + (j * TB_DS + s) * n_total
        frac = jnp.clip(step_t.astype(jnp.float32) / anneal, 0.0, 1.0)
        eps_t = eps0 + frac * (epsf - eps0)
        explore = u[ds, :] < eps_t
        action = jnp.where(explore, rand_a[ds, :], greedy)   # CHOSEN
        if has_noise:
            drunk = yT[A * F : A * F + 1, :] > 0.5
            eff = jnp.where(
                drunk & (stumble[ds, :] > 0), rand2[ds, :], action
            )
        else:
            eff = action

        masks = [(eff == a).astype(jnp.float32) for a in range(A)]
        f = []
        for k in range(F):
            acc = None
            for a in range(A):
                term = yT[a * F + k : a * F + k + 1, :] * masks[a]
                acc = term if acc is None else acc + term
            f.append(acc)
        nxt = f[0].astype(jnp.int32) * 256 + f[1].astype(jnp.int32)
        reward, hidden, done_f = f[2], f[3], f[4]
        t = t_s[:] + 1
        done = (done_f > 0.5) | (t >= max_steps)
        done_x = done.astype(jnp.float32)

        pidx_r[ds, :] = idx
        pt_r[ds, :] = t_s[:]
        act_r[ds, :] = action                               # chosen action
        rew_r[ds, :] = hidden if use_hidden else reward
        nidx_r[ds, :] = nxt
        done_r[ds, :] = done.astype(jnp.int32)

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

    jax.lax.fori_loop(0, rand_a.shape[0], step, 0)

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

        @pl.when(i == n_lane - 1)
        def _():
            step_o[0, 0] = step0[0, 0] + n_t * TB_DS * n_total


@functools.partial(jax.jit, static_argnums=(0,))
def dqn_stoch_collect_run(static, w, state, step0,
                          rand_a, u, bits, stumble, rand2):
    """One fused stochastic collect chunk. ``w`` = [A·F (+drunk) + 1,
    S_pad] payload with the per-chunk greedy row LAST."""
    (S_pad, A, F, max_steps, mode, r0, r1, has_noise, dry_nbits, nb,
     eps0, epsf, anneal, use_hidden) = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = rand_a.shape
    if T % TB_DS:
        raise ValueError(f"chunk steps {T} must be a multiple of {TB_DS}")
    if N % nb:
        raise ValueError(f"lane count {N} not a multiple of lane block {nb}")
    n_lane, n_t = N // nb, T // TB_DS
    rows_w = A * F + (1 if has_noise else 0) + 1
    i32, f32 = jnp.int32, jnp.float32
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, nb), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (TB_DS, nb), lambda i, j: (j, i), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel, S_pad, A, F, max_steps, mode, r0, r1, has_noise,
            dry_nbits, n_lane, n_t, N, eps0, epsf, anneal, use_hidden,
        ),
        grid=(n_lane, n_t),
        in_specs=[
            row(), row(), row(), row(), row(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows_w, S_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            stream(), stream(), stream(), stream(), stream(),
        ],
        out_specs=(
            [row() for _ in range(5)]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [row() for _ in range(4)]
            + [stream() for _ in range(6)]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((1, N), d)
             for d in (i32, i32, f32, f32, i32)]
            + [jax.ShapeDtypeStruct((1, 1), i32)]
            + [jax.ShapeDtypeStruct((1, N), f32) for _ in range(4)]
            + [jax.ShapeDtypeStruct((T, N), d)
               for d in (i32, i32, i32, f32, i32, i32)]
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nb), i32), pltpu.VMEM((1, nb), i32),
            pltpu.VMEM((1, nb), f32), pltpu.VMEM((1, nb), f32),
            pltpu.VMEM((1, nb), i32),
            pltpu.VMEM((1, nb), f32), pltpu.VMEM((1, nb), f32),
            pltpu.VMEM((1, nb), f32), pltpu.VMEM((1, nb), f32),
        ],
        interpret=_interpret(),
    )(idx0, t0, epr0, eph0, epl0, step0, w,
      rand_a, u, bits, stumble, rand2)
    return outs
