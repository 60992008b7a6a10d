"""Fused pallas rollout kernel: T env steps per kernel invocation.

Round-4 successor to the round-2 pallas attempt (PERF.md "Kernel-level
investigation"): that attempt died on Mosaic's per-lane dynamic-gather
rejection. The MXU formulation (`envs/mxu.py`) needs NO gathers — an env
step is a one-hot matmul against the packed payload — so the whole T-step
rollout CAN live inside one kernel, eliminating the per-iteration XLA op
dispatch that PERF.md's MFU section identifies as the 4096-lane roof.

Layout (everything lane-major on N, no relayouts anywhere in the loop):

    ohT [S_pad, N] = (iota_rows == idx)      VPU compare, built transposed
    yT  [A·F, N]   = W2 @ ohT                one MXU matmul (W2 = Wᵀ, padded)
    f_k (1, N)     = Σ_a yT[a·F+k] · m_a     static row mask-sums (VPU);
                                             m_a = (action == a)
    state update   = where(done, reset, …)   (1, N) VPU selects

State (idx, t, ep_return, ep_hidden, ep_len) and the chunk accumulators
live in VMEM scratch across a grid over T-blocks; the presampled action
matrix [T, N] streams in per-block (auto double-buffered), so HBM traffic
is 4 bytes/step/lane of actions and nothing else. Actions are presampled
with the SAME single `jax.random.randint` draw as
``MXUVecEnv.run_random_reduced``, so trajectories are bitwise-identical to
the XLA engines (tests/test_rollout_kernel.py); payload dots are exact
(0/1 one-hot rows, bf16-representable payload).

Scope: deterministic-reset compiled envs (the headline-bench class:
shift/island/sokoban/boat/conveyor/toy). Stochastic envs keep the XLA
MXU engine (threefry inside a kernel would break the key-stream parity
contract).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.compiled import CompiledEnv

N_FIELDS = 4  # next_idx, reward, hidden, done
TB = 128      # action rows per grid step (2 MB VMEM at N=4096, double-buffered)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(S_pad, A, max_steps, reset_idx, n_t,
            idx0, t0, epr0, eph0, epl0, w2, actions,
            idx_o, t_o, epr_o, eph_o, epl_o, racc_o, eacc_o, facc_o,
            idx_s, t_s, epr_s, eph_s, epl_s, racc_s, eacc_s, facc_s):
    # Grid: (lane blocks, T blocks) — T innermost, so each lane block runs
    # its full T sweep with state resident in scratch, then the next lane
    # block re-initializes at j == 0. Episode stats round-trip as state so
    # chunked calls behave exactly like MXUVecEnv's carried MXUState.
    j = pl.program_id(1)
    N = idx0.shape[1]
    F = N_FIELDS

    @pl.when(j == 0)
    def _():
        idx_s[:] = idx0[:]
        t_s[:] = t0[:]
        epr_s[:] = epr0[:]
        eph_s[:] = eph0[:]
        epl_s[:] = epl0[:]
        for ref in (racc_s, eacc_s, facc_s):
            ref[:] = jnp.zeros_like(ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (S_pad, N), 0)
    # Same exactness rule as MXUVecEnv: bf16 payload only when every value
    # is bf16-representable, else f32 with HIGHEST precision.
    w2_dtype = w2.dtype
    precision = (
        jax.lax.Precision.DEFAULT
        if w2_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def step(s, _):
        idx = idx_s[:]                                   # (1, N) i32
        ohT = (rows == idx).astype(w2_dtype)              # [S_pad, N]
        yT = jax.lax.dot_general(                         # [A*F, N] f32
            w2[:], ohT,
            (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        a = actions[pl.ds(s, 1), :]                       # (1, N) i32
        f = []
        for k in range(F):
            acc = None
            for act in range(A):
                m = (a == act).astype(jnp.float32)        # (1, N)
                term = yT[act * F + k : act * F + k + 1, :] * m
                acc = term if acc is None else acc + term
            f.append(acc)
        nxt, reward, hidden, done_f = f
        t = t_s[:] + 1
        done = (done_f > 0.5) | (t >= max_steps)
        epr = epr_s[:] + reward
        eph = eph_s[:] + hidden
        epl = epl_s[:] + 1
        done_i = done.astype(jnp.int32)
        done_x = done.astype(jnp.float32)
        idx_s[:] = jnp.where(done, reset_idx, nxt.astype(jnp.int32))
        t_s[:] = jnp.where(done, 0, t)
        epr_s[:] = jnp.where(done, 0.0, epr)
        eph_s[:] = jnp.where(done, 0.0, eph)
        epl_s[:] = jnp.where(done, 0, epl)
        racc_s[:] = racc_s[:] + reward
        eacc_s[:] = eacc_s[:] + done_x
        facc_s[:] = facc_s[:] + done_x * epr
        return 0

    jax.lax.fori_loop(0, actions.shape[0], step, 0)

    @pl.when(j == n_t - 1)
    def _():
        idx_o[:] = idx_s[:]
        t_o[:] = t_s[:]
        epr_o[:] = epr_s[:]
        eph_o[:] = eph_s[:]
        epl_o[:] = epl_s[:]
        racc_o[:] = racc_s[:]
        eacc_o[:] = eacc_s[:]
        facc_o[:] = facc_s[:]


@functools.partial(jax.jit, static_argnums=(0,))
def _run(static, w2, state, actions):
    S_pad, A, max_steps, reset_idx, nb_cap = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = actions.shape
    NB = min(N, nb_cap)  # lane block: bounds VMEM at wide lane counts
    if N % NB:
        raise ValueError(
            f"lane count {N} must be a multiple of the lane block {NB} "
            f"(counts > {nb_cap} must be multiples of {nb_cap}; e.g. 8192, "
            "not 6144)"
        )
    tb = TB
    while T % tb:
        tb //= 2
    assert tb >= 1
    n_lane, n_t = N // NB, T // tb
    AF = A * N_FIELDS
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, NB), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    i32, f32 = jnp.int32, jnp.float32
    outs = pl.pallas_call(
        functools.partial(
            _kernel, S_pad, A, max_steps, reset_idx, n_t
        ),
        grid=(n_lane, n_t),
        in_specs=[
            row(),  # idx0
            row(),  # t0
            row(),  # ep_return0
            row(),  # ep_hidden0
            row(),  # ep_len0
            pl.BlockSpec((AF, S_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, NB), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row() for _ in range(8)],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), d)
            for d in (i32, i32, f32, f32, i32, f32, f32, f32)
        ],
        scratch_shapes=[
            pltpu.VMEM((1, NB), i32),   # idx
            pltpu.VMEM((1, NB), i32),   # t
            pltpu.VMEM((1, NB), f32),   # ep_return
            pltpu.VMEM((1, NB), f32),   # ep_hidden
            pltpu.VMEM((1, NB), i32),   # ep_len
            pltpu.VMEM((1, NB), f32),   # reward acc
            pltpu.VMEM((1, NB), f32),   # episode acc
            pltpu.VMEM((1, NB), f32),   # finished-return acc
        ],
        interpret=_interpret(),
    )(idx0, t0, epr0, eph0, epl0, w2, actions)
    return outs


class PallasRolloutEngine:
    """MXUVecEnv-shaped wrapper over the fused kernel (deterministic-reset
    compiled envs only; same payload, same action-draw protocol)."""

    def __init__(self, cenv: CompiledEnv, n_envs: int,
                 lane_block: int | None = None):
        from ..envs.mxu import MXUVecEnv

        base = MXUVecEnv(cenv, n_envs)  # reuses reset probing + payload build
        assert not base._stochastic, (
            f"{cenv.name}: stochastic envs keep the XLA MXU engine"
        )
        self.cenv = cenv
        self.n_envs = n_envs
        self.S, self.A = base.S, base.A
        self.max_steps = base.max_steps
        self.reset_idx = base.reset_idx
        self.S_pad = _round_up(self.S, 64)

        # VMEM feasibility: the step holds ~2 [S_pad, NB] operands (one-hot
        # + matmul residency) plus the [A·F, S_pad] payload and the
        # double-buffered [TB, NB] action stream. With no explicit
        # lane_block, auto-pick the largest power-of-two that fits (big-S
        # envs like sokoban need NB < 4096); an explicit lane_block that
        # doesn't fit still fails loudly.
        def est(nb):
            return (
                2 * self.S_pad * nb * 4
                + self.A * N_FIELDS * self.S_pad * 4
                + 2 * TB * nb * 4
            )

        if lane_block is None:
            lane_block = min(n_envs, 4096)
            while lane_block > 128 and (
                est(lane_block) > 12 * 1024 * 1024
                or n_envs % lane_block
            ):
                lane_block //= 2
        nb = min(n_envs, lane_block)
        if est(nb) > 12 * 1024 * 1024:
            raise ValueError(
                f"{cenv.name}: S={self.S} (padded {self.S_pad}) × lane block "
                f"{nb} needs ~{est(nb) >> 20} MB of VMEM — pass a smaller "
                "lane_block or use the XLA MXU engine"
            )
        self._lane_block = lane_block
        # W2 = transposed payload [A*F, S_pad]; padding rows never match the
        # one-hot compare (indices < S), so zero columns are inert.
        W = np.asarray(base._W, np.float32)  # [S, A*F]
        W2 = np.zeros((self.A * N_FIELDS, self.S_pad), np.float32)
        W2[:, : self.S] = W.T
        # Inherit the XLA engine's exactness decision (bf16 only when the
        # whole payload — indices included — is bf16-representable).
        self._w2 = jnp.asarray(W2, base._dtype)
        self._static = (
            self.S_pad, self.A, self.max_steps, self.reset_idx, lane_block
        )

    def reset(self) -> Tuple[jnp.ndarray, ...]:
        """Deterministic reset: (idx, t, ep_return, ep_hidden, ep_len),
        each (1, N) — the full carried state, so chunked calls compose."""
        n = self.n_envs
        z_i = jnp.zeros((1, n), jnp.int32)
        z_f = jnp.zeros((1, n), jnp.float32)
        return (
            jnp.full((1, n), self.reset_idx, jnp.int32),
            z_i, z_f, z_f, z_i,
        )

    def run_random_reduced(self, state, key, n_steps: int):
        """Same protocol as ``MXUVecEnv.run_random_reduced``: ONE presampled
        randint [T, N] (bitwise the same action stream), chunk totals out."""
        actions = jax.random.randint(
            key, (n_steps, self.n_envs), 0, self.A
        )
        outs = _run(self._static, self._w2, state, actions)
        (idx, t, epr, eph, epl, racc, eacc, facc) = outs
        acc = {
            "reward_sum": racc.sum(),
            "episodes": eacc.sum().astype(jnp.int32),
            "finished_return_sum": facc.sum(),
        }
        return (idx, t, epr, eph, epl), acc

    def run_actions(self, state, actions_tn):
        """Raw action-matrix entry point (parity tests)."""
        return _run(self._static, self._w2, state, actions_tn)


class ShardedPallasRolloutEngine:
    """Multi-device pallas rollout: ``shard_map`` around the kernel over the
    mesh's ``data`` axis (round 5, VERDICT r4 missing #1).

    The kernel is embarrassingly lane-parallel — per-lane state, zero
    cross-lane reads — so sharding is pure lane partitioning with NO
    collectives in the hot path (the chunk-total sums after the kernel are
    the only cross-device reduction, inserted by XLA at the ``.sum()``).
    The action matrix is drawn GLOBALLY with the same single ``randint`` as
    the single-device protocol and only then lane-split, so per-lane
    trajectories are bitwise-identical to ``PallasRolloutEngine``
    (tests/test_rollout_kernel.py sharded leg). Spec: SURVEY.md §2d env
    vectorization + DP rows; BASELINE.md 16-chip scaling target.
    """

    def __init__(self, cenv: CompiledEnv, n_envs: int, mesh,
                 lane_block: int | None = None):
        from ..parallel.mesh import DATA_AXIS

        self.mesh = mesh
        self.axis = DATA_AXIS
        self.n_dev = mesh.shape[DATA_AXIS]
        if n_envs % self.n_dev:
            raise ValueError(
                f"n_envs {n_envs} must be a multiple of the data-axis size "
                f"{self.n_dev}"
            )
        # Per-shard engine: same payload build, per-device lane count.
        self.local = PallasRolloutEngine(
            cenv, n_envs // self.n_dev, lane_block
        )
        self.cenv = cenv
        self.n_envs = n_envs
        self.A = self.local.A
        self.reset_idx = self.local.reset_idx

    def reset(self):
        n = self.n_envs
        z_i = jnp.zeros((1, n), jnp.int32)
        z_f = jnp.zeros((1, n), jnp.float32)
        return (
            jnp.full((1, n), self.reset_idx, jnp.int32),
            z_i, z_f, z_f, z_i,
        )

    def run_actions(self, state, actions_tn):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        lanes = P(None, self.axis)
        repl = P(None, None)
        local_static = self.local._static

        def shard_fn(w2, st, a):
            return _run(local_static, w2, st, a)

        return shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(repl, (lanes,) * 5, lanes),
            out_specs=(lanes,) * 8,
            check_vma=False,  # pallas_call inside shard_map
        )(self.local._w2, state, actions_tn)

    def run_random_reduced(self, state, key, n_steps: int):
        """Identical protocol to the single-device engine: ONE global
        [T, N] randint, chunk totals out (the sums are the only collective)."""
        actions = jax.random.randint(
            key, (n_steps, self.n_envs), 0, self.A
        )
        outs = self.run_actions(state, actions)
        (idx, t, epr, eph, epl, racc, eacc, facc) = outs
        acc = {
            "reward_sum": racc.sum(),
            "episodes": eacc.sum().astype(jnp.int32),
            "finished_return_sum": facc.sum(),
        }
        return (idx, t, epr, eph, epl), acc
