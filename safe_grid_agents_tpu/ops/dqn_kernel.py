"""Fused pallas DQN COLLECT kernel: ε-greedy act → env step → record, all
inside one kernel for T steps (round 5, VERDICT r4 next #1).

The round-4 decomposition (PERF.md "DQN-MXU decomposition") pinned the
MXU-DQN trainer's roof at the COLLECT phase's per-step kernel-launch floor
(~28 ms per 1.05 M-step chunk → ~37 M steps/s asymptote even with free
updates); the update phase costs ~3 ms after the flat/roll treatment. So
the fused treatment splits exactly there: collect runs in ONE kernel, the
(already cheap, fully-featured) XLA update phase is reused unchanged —
n-step / double-Q / PER / target sync all keep working bit-for-bit.

Two collapses make the in-kernel step ONE small bf16 matmul:

1. During a collect chunk the params are FROZEN, and for a compiled env Q
   is a pure function of the state index (both the table-net and the MLP
   path — `agents/dqn.py::q_values`). So the whole network evaluates once
   per chunk into ``Q_all = q_values(params, arange(S))``, and its
   first-max argmax bakes into a GREEDY-ACTION ROW of the payload — the
   kernel never touches a Q value, deleting the f32-HIGHEST readout
   matmul a naive port would pay per step.
2. The only payload field that is not bf16-exact is ``next_idx`` (states
   run past 255); split it into hi/lo BYTES (both ≤ 255, bf16-exact) and
   recombine ``nxt = hi·256 + lo`` after the dot. With integer rewards
   (every suite env) the whole payload is then bf16-exact, so the matmul
   runs at bf16 MXU rate while staying bitwise (one-hot dots of exact
   values, f32 accumulation).

    yT [A·5+1, N] = W @ ohT      hi, lo, reward, hidden, done per action
                                 + the greedy row (one bf16 MXU matmul)
    action (1, N) = where(u < ε(step), rand_a, greedy)
    records [tb,N] = (pre_idx, pre_t, action, reward, next_idx, done)
                     streamed OUT per T-block (auto double-buffered)

RNG protocol (this trainer's own documented contract, like the tabular
kernel — NOT the MXU trainer's per-step split chain): per chunk ONE key
splits into (k_actions, k_uniform); ``randint(k_actions, [T, N])`` and
``uniform(k_uniform, [T, N])`` are presampled with threefry OUTSIDE the
kernel and streamed in; per step ``explore = u_t < ε(step_t)`` with the
same linear anneal, the step counter advancing by N per vector step.
Warmup reuses the kernel with ε pinned to 1.0 (u ∈ [0, 1) < 1 always ⇒
action = the presampled uniform action, i.e. the random policy).

Geometry: grid (lane blocks, T blocks), T innermost; the lane block NB is
chosen adaptively as the largest power-of-two fraction of N whose
[S_pad, NB] one-hot working set fits VMEM (sokoban's S=1296 needs NB≤1024
where shift's S=63 runs a single 4096-lane block).

Scope: deterministic-reset compiled envs (sokoban — BASELINE config 3 —
shift, island, boat, conveyor, toy). Stochastic aliases keep the XLA MXU
trainer. Reference counterpart: the reference's single-env Python collect
loop (SURVEY.md §3.1 hot loop); nothing like this exists there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rollout_kernel import _interpret, _round_up

TB_REC = 16   # T-block: 6 record streams are live per block — keep it small
F_K = 5       # payload fields per action: next_hi, next_lo, reward, hidden, done


def build_payload(mxu) -> np.ndarray:
    """[A·F_K + 1, S_pad] static payload (greedy row appended per chunk):
    per-action (next_hi, next_lo, reward, hidden, done) columns over states.
    Returns the f32 array; the caller decides bf16 eligibility."""
    S, A = mxu.S, mxu.A
    S_pad = _round_up(S, 64)
    cenv = mxu.cenv
    W = np.zeros((A * F_K, S_pad), np.float32)
    nxt = np.asarray(cenv.next_table, np.int64)        # [S, A]
    assert nxt.max() < 1 << 16, "hi/lo byte split needs S < 65536"
    W[0::F_K, :S] = (nxt // 256).T
    W[1::F_K, :S] = (nxt % 256).T
    W[2::F_K, :S] = np.asarray(cenv.reward_table, np.float32).T
    W[3::F_K, :S] = np.asarray(cenv.hidden_table, np.float32).T
    W[4::F_K, :S] = np.asarray(cenv.done_table, np.float32).T
    return W


def _kernel(S_pad, A, max_steps, reset_idx, n_lane, n_t, n_total,
            eps0, epsf, anneal, use_hidden,
            idx0, t0, epr0, eph0, epl0, step0, w, rand_a, u,
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

    def step(s, _):
        idx = idx_s[:]                                     # (1, N)
        ohT = (rows == idx).astype(w_dtype)                 # [S_pad, N]
        yT = jax.lax.dot_general(                           # [A·F_K+1, N]
            w[:], ohT, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        greedy = yT[A * F_K : A * F_K + 1, :].astype(jnp.int32)
        step_t = step0[0, 0] + (j * TB_REC + s) * n_total
        frac = jnp.clip(step_t.astype(jnp.float32) / anneal, 0.0, 1.0)
        eps_t = eps0 + frac * (epsf - eps0)
        explore = u[pl.ds(s, 1), :] < eps_t
        action = jnp.where(explore, rand_a[pl.ds(s, 1), :], greedy)

        masks = [(action == a).astype(jnp.float32) for a in range(A)]
        f = []
        for k in range(F_K):
            acc = None
            for a in range(A):
                term = yT[a * F_K + k : a * F_K + k + 1, :] * masks[a]
                acc = term if acc is None else acc + term
            f.append(acc)
        hi, lo, reward, hidden, done_f = f
        nxt = hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)
        t = t_s[:] + 1
        done = (done_f > 0.5) | (t >= max_steps)
        done_x = done.astype(jnp.float32)

        # -- transition record (streams out per T-block) -------------------
        ds = pl.ds(s, 1)
        pidx_r[ds, :] = idx
        pt_r[ds, :] = t_s[:]
        act_r[ds, :] = action
        rew_r[ds, :] = hidden if use_hidden else reward
        nidx_r[ds, :] = nxt
        done_r[ds, :] = done.astype(jnp.int32)

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
            step_o[0, 0] = step0[0, 0] + n_t * TB_REC * n_total


def pick_lane_block(S_pad: int, n_envs: int, budget=10 * 1024 * 1024) -> int:
    """Largest power-of-two lane block (≤ 4096, dividing n_envs) whose
    working set — ~2 live [S_pad, NB] operands plus the double-buffered
    record/draw streams — fits the VMEM budget."""
    nb = min(n_envs, 4096)
    while nb > 128:
        est = 2 * S_pad * nb * 4 + (6 + 2) * TB_REC * nb * 4 * 2
        if est <= budget and n_envs % nb == 0:
            return nb
        nb //= 2
    return nb


@functools.partial(jax.jit, static_argnums=(0,))
def dqn_collect_run(static, w, state, step0, rand_a, u):
    """One fused collect chunk. ``w`` is the [A·F_K + 1, S_pad] payload WITH
    the per-chunk greedy row appended (trainer builds it from the frozen
    params). Returns (final state rows, stat accumulators, step counter,
    record streams [T, N] × 6)."""
    (S_pad, A, max_steps, reset_idx, nb,
     eps0, epsf, anneal, use_hidden) = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = rand_a.shape
    if T % TB_REC:
        raise ValueError(f"chunk steps {T} must be a multiple of {TB_REC}")
    if N % nb:
        raise ValueError(f"lane count {N} not a multiple of lane block {nb}")
    n_lane, n_t = N // nb, T // TB_REC
    AF = A * F_K + 1
    i32, f32 = jnp.int32, jnp.float32
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, nb), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (TB_REC, nb), lambda i, j: (j, i), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel, S_pad, A, max_steps, reset_idx, n_lane, n_t, N,
            eps0, epsf, anneal, use_hidden,
        ),
        grid=(n_lane, n_t),
        in_specs=[
            row(), row(), row(), row(), row(),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # step0 (1, 1)
            pl.BlockSpec((AF, S_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),   # payload + greedy row
            stream(),  # rand_a
            stream(),  # u
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
            pltpu.VMEM((1, nb), i32),   # idx
            pltpu.VMEM((1, nb), i32),   # t
            pltpu.VMEM((1, nb), f32),   # ep_return
            pltpu.VMEM((1, nb), f32),   # ep_hidden
            pltpu.VMEM((1, nb), i32),   # ep_len
            pltpu.VMEM((1, nb), f32),   # episodes acc
            pltpu.VMEM((1, nb), f32),   # finished return acc
            pltpu.VMEM((1, nb), f32),   # finished hidden acc
            pltpu.VMEM((1, nb), f32),   # finished length acc
        ],
        interpret=_interpret(),
    )(idx0, t0, epr0, eph0, epl0, step0, w, rand_a, u)
    return outs
