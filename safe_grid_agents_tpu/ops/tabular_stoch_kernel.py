"""Fused pallas tabular-Q TRAINING kernel for STOCHASTIC compiled envs
(round 5): the deterministic fused trainer (`ops/tabular_kernel.py`)
extended with the stochastic rollout kernel's mechanics
(`ops/stoch_rollout_kernel.py`), so ``--fused-kernel`` tabular-q covers
absent / interrupt / whisky / friend / foe / neutral too.

Per step, everything in VMEM like the deterministic kernel:

    qa   = QT @ ohT            ε-greedy readout (f32 HIGHEST, exact)
    a    = where(u < ε, rand_a, first-max argmax)       CHOSEN action
    eff  = where(drunk ∧ stumble, rand2, a)             effective action
                                                        (whisky noise;
                                                        drunk = payload row)
    yT   = W @ ohT             env step on the EFFECTIVE action (hi/lo
                               payload fields, coin/carried reset select)
    TD   on (idx, CHOSEN a)    — the semantics of VecEnv training: the
                               agent learns Q[s, a_chosen] from the reward
                               of the effective transition, exactly like
                               ``TabularQTrainer`` on a noisy env
    QT  += lr · tdT / max(cntT, 1)                      duplicate-averaged

RNG protocol (this trainer's own documented contract): per chunk ONE key
splits FIVE ways (k_rand, k_u, k_bits, k_stumble, k_rand2) —
exploration actions, exploration uniforms, reset coins (or, for drying
envs, packed per-tomato ``bernoulli(DRY_PROB)`` masks in the same i32
slot — stoch_rollout_kernel module doc), stumble coins, stumble actions
— all presampled [T, N] with threefry outside and streamed per T-block
(tb=32: five double-buffered streams).

tomato's drying (round-5 closing) follows the base trainers' semantics
exactly: the agent ACTS and LEARNS on the pre-dry index it observed
(``MXUTabularQTrainer`` records ``state.idx`` before the env's
``stochastic_index`` hook fires), while the env payload matmul runs on
the DRIED index — one extra one-hot build per step, still zero gathers.
Host-replay equivalence + learning gates: tests/test_tabular_kernel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import _interpret

TB_TS = 32  # five draw streams live per T-block


def _kernel(S_pad, A, A_pad, F, max_steps, mode, r0, r1, has_noise,
            dry_nbits, n_t, n_envs, lr, discount, eps0, epsf, anneal,
            q0, idx0, t0, epr0, eph0, epl0, step0, w,
            rand_a, u, bits, stumble, rand2,
            q_o, idx_o, t_o, epr_o, eph_o, epl_o, step_o,
            eacc_o, racc_o, hacc_o, lacc_o,
            q_s, idx_s, t_s, epr_s, eph_s, epl_s,
            eacc_s, racc_s, hacc_s, lacc_s):
    j = pl.program_id(0)
    N = idx0.shape[1]

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
    w_dtype = w.dtype
    precision = (
        jax.lax.Precision.DEFAULT
        if w_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    hi = jax.lax.Precision.HIGHEST

    def readout(q, ohT):
        return jax.lax.dot_general(
            q, ohT, (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )

    def step(s, _):
        idx = idx_s[:]
        ohT_b = (rows == idx)
        ohT_f = ohT_b.astype(jnp.float32)
        ds = pl.ds(s, 1)

        # -- ε-greedy act (chosen action; first-max argmax) ----------------
        qa = readout(q_s[:], ohT_f)                        # [A_pad, N]
        m = qa[0:1, :]
        for a in range(1, A):
            m = jnp.maximum(m, qa[a : a + 1, :])
        greedy = jnp.full_like(idx, A - 1)
        for a in range(A - 2, -1, -1):
            greedy = jnp.where(qa[a : a + 1, :] == m, a, greedy)
        step_t = step0[0, 0] + (j * TB_TS + s) * n_envs
        frac = jnp.clip(step_t.astype(jnp.float32) / anneal, 0.0, 1.0)
        eps_t = eps0 + frac * (epsf - eps0)
        explore = u[ds, :] < eps_t
        action = jnp.where(explore, rand_a[ds, :], greedy)

        # -- env step on the EFFECTIVE action ------------------------------
        if dry_nbits:
            # Drying (module doc): the env steps on the DRIED index; the
            # act above and the TD below stay on the observed pre-dry
            # one-hot, matching the base trainers.
            dried = idx - (idx & ((1 << dry_nbits) - 1) & bits[ds, :])
            ohT_e = (rows == dried).astype(w_dtype)
        else:
            ohT_e = ohT_b.astype(w_dtype)
        yT = jax.lax.dot_general(
            w[:], ohT_e, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        if has_noise:
            drunk = yT[A * F : A * F + 1, :] > 0.5
            eff = jnp.where(
                drunk & (stumble[ds, :] > 0), rand2[ds, :], action
            )
        else:
            eff = action
        masks_e = [(eff == a).astype(jnp.float32) for a in range(A)]
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

        # -- TD learn on the CHOSEN action (pre-update Q throughout) -------
        masks_c = [(action == a).astype(jnp.float32) for a in range(A)]
        ohT_n = (rows == nxt).astype(jnp.float32)
        qn = readout(q_s[:], ohT_n)
        boot = qn[0:1, :]
        for a in range(1, A):
            boot = jnp.maximum(boot, qn[a : a + 1, :])
        target = reward + discount * jnp.where(done, 0.0, boot)
        q_sa = None
        for a in range(A):
            term = qa[a : a + 1, :] * masks_c[a]
            q_sa = term if q_sa is None else q_sa + term
        td = target - q_sa
        X = jnp.concatenate(
            [masks_c[a] * td for a in range(A)]
            + [jnp.zeros_like(td)] * (A_pad - A), axis=0,
        )
        M = jnp.concatenate(
            masks_c + [jnp.zeros_like(td)] * (A_pad - A), axis=0
        )
        td_sum = jax.lax.dot_general(
            X, ohT_f, (((1,), (1,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )
        cnt = jax.lax.dot_general(
            M, ohT_f, (((1,), (1,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )
        q_s[:] = q_s[:] + lr * td_sum / jnp.maximum(cnt, 1.0)

        # -- stochastic reset select ---------------------------------------
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

        # -- episode accounting + auto-reset -------------------------------
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
        q_o[:] = q_s[:]
        idx_o[:] = idx_s[:]
        t_o[:] = t_s[:]
        epr_o[:] = epr_s[:]
        eph_o[:] = eph_s[:]
        epl_o[:] = epl_s[:]
        step_o[0, 0] = step0[0, 0] + n_t * TB_TS * n_envs
        eacc_o[:] = eacc_s[:]
        racc_o[:] = racc_s[:]
        hacc_o[:] = hacc_s[:]
        lacc_o[:] = lacc_s[:]


@functools.partial(jax.jit, static_argnums=(0,))
def tabq_stoch_run(static, w, qT, state, step0,
                   rand_a, u, bits, stumble, rand2):
    (S_pad, A, A_pad, F, max_steps, mode, r0, r1, has_noise, dry_nbits,
     lr, discount, eps0, epsf, anneal) = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = rand_a.shape
    if T % TB_TS:
        raise ValueError(f"chunk steps {T} must be a multiple of {TB_TS}")
    n_t = T // TB_TS
    rows_w = A * F + (1 if has_noise else 0)
    i32, f32 = jnp.int32, jnp.float32
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, N), lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (TB_TS, N), lambda j: (j, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel, S_pad, A, A_pad, F, max_steps, mode, r0, r1,
            has_noise, dry_nbits, n_t, N, lr, discount, eps0, epsf, anneal,
        ),
        grid=(n_t,),
        in_specs=[
            full((A_pad, S_pad)),   # Q
            row(), row(), row(), row(), row(),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # step0
            full((rows_w, S_pad)),  # payload
            stream(), stream(), stream(), stream(), stream(),
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
            pltpu.VMEM((A_pad, S_pad), f32),
            pltpu.VMEM((1, N), i32), pltpu.VMEM((1, N), i32),
            pltpu.VMEM((1, N), f32), pltpu.VMEM((1, N), f32),
            pltpu.VMEM((1, N), i32),
            pltpu.VMEM((1, N), f32), pltpu.VMEM((1, N), f32),
            pltpu.VMEM((1, N), f32), pltpu.VMEM((1, N), f32),
        ],
        interpret=_interpret(),
    )(qT, idx0, t0, epr0, eph0, epl0, step0, w,
      rand_a, u, bits, stumble, rand2)
    return outs
