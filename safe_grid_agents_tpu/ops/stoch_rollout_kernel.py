"""Fused pallas rollout kernel for STOCHASTIC compiled envs (round 5,
VERDICT r4 missing #2 / next #4).

The deterministic rollout kernel (`ops/rollout_kernel.py`) scopes to
deterministic-reset envs because threefry inside a kernel would break the
key-stream parity contract. The tabular training kernel established the
escape hatch (`ops/tabular_kernel.py` RNG note): presample the draws in
bulk OUTSIDE the kernel under the engine's OWN documented protocol and
stream them in, gating correctness by host-replay equivalence instead of
bitwise-vs-VecEnv. This module applies that recipe to every stochastic
mechanism the compiled suite has except tomato's drying:

* **coin reset** (absent's supervisor, interrupt's arming): the reset draw
  is one bernoulli(0.5) selecting between two probed reset states — a
  presampled bit stream [T, N] and a 2-way select between constants;
* **carried coin reset** (friend/foe/neutral via ``BoundedFriendFoe``):
  the two carry-reset candidates of the successor state ride the payload
  (same construction as ``MXUVecEnv``'s fields 4/5) and the same bit
  stream picks between them per lane;
* **action noise** (whisky's drunk stumble): the drunk flag is a payload
  row (a pure function of the state index), and presampled
  ``bernoulli(STUMBLE_PROB)`` + ``randint`` streams replace the action
  where drunk ∧ stumble — exactly ``WhiskyGold.noisy_action``'s math with
  this engine's own draw order;
* **index drying** (tomato's ``stochastic_index``, round-5 closing): the
  round-4 exclusion note priced drying as per-tomato [S_pad, S_pad]
  permutation matmuls or per-lane gathers — but ``tomato.state_index``
  ENCODES the watered bits positionally (``idx = cell·2^K + bits``), so
  clearing tomato k is pure elementwise i32 arithmetic on the index row:
  ``idx' = idx − (idx & (2^K−1) & dry_mask)``. The per-(step, lane)
  K-bit dry masks (one ``bernoulli(DRY_PROB)`` per tomato, packed) are
  presampled into the ``bits`` stream — drying envs have deterministic
  resets (mode 0), so the reset-coin slot is free — and the whole
  mechanism costs one VPU and-subtract per step. No permutations, no
  gathers, no extra matmul.

All index-valued payload fields (next state, carry candidates) are split
into bf16-exact hi/lo bytes (the `ops/dqn_kernel.py` trick), so every
suite env with integer rewards runs the one per-step matmul at bf16 MXU
rate while staying bitwise vs the host replay.

RNG protocol (this engine's own documented contract): per chunk ONE key
splits into (k_act, k_bits, k_stumble, k_rand);
``randint(k_act, [T, N], 0, A)`` actions, ``bernoulli(k_bits, 0.5)``
reset coins — or, for drying envs, ``bernoulli(k_bits, DRY_PROB,
[T, N, K])`` per-tomato coins packed little-endian into the same i32
``bits`` stream — ``bernoulli(k_stumble, p_noise)`` stumbles and
``randint(k_rand, [T, N], 0, A)`` stumble actions are presampled with
threefry outside and streamed per T-block; ``reset(key)`` draws the
initial coins as ``bernoulli(key, 0.5, [N])``. Trajectories are NOT
bitwise with VecEnv/MXUVecEnv (different draw order, same per-mechanism
distributions); tests/test_stoch_rollout_kernel.py pins a NumPy
host-replay of this exact protocol plus 5σ statistical gates.
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
from .rollout_kernel import _interpret, _round_up

# T-block: FOUR double-buffered [tb, NB] draw streams are live (actions,
# reset bits, stumble bits, stumble actions) — at the deterministic
# kernel's TB=128 that alone is 16 MB of VMEM (measured OOM by 244 KB at
# 4096 lanes); 32 keeps the stream footprint at 4 MB.
TB_S = 32


def _kernel(S_pad, A, F, max_steps, mode, r0, r1, has_noise, dry_nbits,
            n_t,
            idx0, t0, epr0, eph0, epl0, w, actions, bits, stumble, rand_a,
            idx_o, t_o, epr_o, eph_o, epl_o, racc_o, eacc_o, facc_o,
            idx_s, t_s, epr_s, eph_s, epl_s, racc_s, eacc_s, facc_s):
    j = pl.program_id(1)
    N = idx0.shape[1]

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
    w_dtype = w.dtype
    precision = (
        jax.lax.Precision.DEFAULT
        if w_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def step(s, _):
        idx = idx_s[:]
        ds = pl.ds(s, 1)
        if dry_nbits:
            # tomato's drying: clear presampled watered bits of the index
            # (module doc) — elementwise i32, BEFORE the table step, same
            # order as CompiledEnv.step's stochastic_index hook.
            idx = idx - (idx & ((1 << dry_nbits) - 1) & bits[ds, :])
        ohT = (rows == idx).astype(w_dtype)
        yT = jax.lax.dot_general(
            w[:], ohT, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        a = actions[ds, :]
        if has_noise:
            drunk = yT[A * F : A * F + 1, :] > 0.5
            a = jnp.where(
                drunk & (stumble[ds, :] > 0), rand_a[ds, :], a
            )
        masks = [(a == act).astype(jnp.float32) for act in range(A)]
        f = []
        for k in range(F):
            acc = None
            for act in range(A):
                term = yT[act * F + k : act * F + k + 1, :] * masks[act]
                acc = term if acc is None else acc + term
            f.append(acc)
        # fields: n_hi, n_lo, reward, hidden, done [, c0_hi, c0_lo, c1_hi,
        # c1_lo] — index fields recombine from exact bytes.
        nxt = f[0].astype(jnp.int32) * 256 + f[1].astype(jnp.int32)
        reward, hidden, done_f = f[2], f[3], f[4]
        t = t_s[:] + 1
        done = (done_f > 0.5) | (t >= max_steps)
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
        done_x = done.astype(jnp.float32)
        racc_s[:] = racc_s[:] + reward
        eacc_s[:] = eacc_s[:] + done_x
        facc_s[:] = facc_s[:] + done_x * epr
        idx_s[:] = jnp.where(done, reset_lane, nxt)
        t_s[:] = jnp.where(done, 0, t)
        epr_s[:] = jnp.where(done, 0.0, epr)
        eph_s[:] = jnp.where(done, 0.0, eph)
        epl_s[:] = jnp.where(done, 0, epl)
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
def _run(static, w, state, actions, bits, stumble, rand_a):
    (S_pad, A, F, max_steps, mode, r0, r1, has_noise, dry_nbits,
     nb_cap) = static
    idx0, t0, epr0, eph0, epl0 = state
    T, N = actions.shape
    NB = min(N, nb_cap)
    if N % NB:
        raise ValueError(
            f"lane count {N} must be a multiple of the lane block {NB}"
        )
    tb = TB_S
    while T % tb:
        tb //= 2
    n_lane, n_t = N // NB, T // tb
    rows_w = A * F + (1 if has_noise else 0)
    i32, f32 = jnp.int32, jnp.float32
    row = lambda: pl.BlockSpec(  # noqa: E731
        (1, NB), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (tb, NB), lambda i, j: (j, i), memory_space=pltpu.VMEM
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
            stream(),  # actions
            stream(),  # reset bits
            stream(),  # stumble bits
            stream(),  # stumble actions
        ],
        out_specs=[row() for _ in range(8)],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), d)
            for d in (i32, i32, f32, f32, i32, f32, f32, f32)
        ],
        scratch_shapes=[
            pltpu.VMEM((1, NB), i32), pltpu.VMEM((1, NB), i32),
            pltpu.VMEM((1, NB), f32), pltpu.VMEM((1, NB), f32),
            pltpu.VMEM((1, NB), i32), pltpu.VMEM((1, NB), f32),
            pltpu.VMEM((1, NB), f32), pltpu.VMEM((1, NB), f32),
        ],
        interpret=_interpret(),
    )(idx0, t0, epr0, eph0, epl0, w, actions, bits, stumble, rand_a)
    return outs


class PallasStochRolloutEngine:
    """Rollout engine over the stochastic kernel. Covers coin-reset envs
    (absent, interrupt), carried-reset envs (friend/foe/neutral),
    whisky's action noise and tomato's index drying; rejects plain
    deterministic envs (use :class:`~.rollout_kernel.PallasRolloutEngine`).
    """

    def __init__(self, cenv: CompiledEnv, n_envs: int,
                 lane_block: int = 4096):
        from ..envs.mxu import MXUVecEnv

        base = MXUVecEnv(cenv, n_envs)  # payload probing + reset analysis
        if not base._stochastic:
            raise ValueError(
                f"{cenv.name}: deterministic env — use PallasRolloutEngine"
            )
        self._dry_nbits = 0
        self._p_dry = 0.0
        if base._stoch_index:
            from ..envs.tomato import DRY_PROB, TomatoWatering

            if not isinstance(cenv.base, TomatoWatering):
                raise ValueError(
                    f"{cenv.name}: unknown stochastic_index env for the "
                    "kernel — only tomato's low-bit drying is supported"
                )
            # Drying multiplexes the reset-coin stream (module doc): the
            # suite's drying envs have deterministic resets and no action
            # noise, which the MXUVecEnv analysis guarantees here.
            assert not (base._stoch_reset or base._carried_reset
                        or base._noisy), cenv.name
            self._dry_nbits = int(cenv.base.n_tomatoes)
            self._p_dry = float(DRY_PROB)
        self.cenv = cenv
        self.n_envs = n_envs
        self.S, self.A = base.S, base.A
        self.max_steps = base.max_steps
        self.S_pad = _round_up(self.S, 64)
        self._noise = bool(base._noisy)
        if base._carried_reset:
            self._mode = 2
            self._r0 = base.reset_idx_bit[0]
            self._r1 = base.reset_idx_bit[1]
        elif base._stoch_reset:
            self._mode = 1
            self._r0 = base.reset_idx_bit[0]
            self._r1 = base.reset_idx_bit[1]
        else:
            self._mode = 0
            self._r0 = self._r1 = base.reset_idx

        # hi/lo-split payload over the compiled tables (+ carry candidate
        # fields for carried resets, + the drunk-flag row for noise).
        S, A = self.S, self.A
        F = 9 if self._mode == 2 else 5
        self.F = F
        nxt = np.asarray(cenv.next_table, np.int64)
        assert nxt.max() < 1 << 16
        W = np.zeros((A * F + (1 if self._noise else 0), self.S_pad),
                     np.float32)
        W[0:A * F:F, :S] = (nxt // 256).T
        W[1:A * F:F, :S] = (nxt % 256).T
        W[2:A * F:F, :S] = np.asarray(cenv.reward_table, np.float32).T
        W[3:A * F:F, :S] = np.asarray(cenv.hidden_table, np.float32).T
        W[4:A * F:F, :S] = np.asarray(cenv.done_table, np.float32).T
        if self._mode == 2:
            for b in (0, 1):
                cand = np.asarray(base._carry_tab[b], np.int64)[nxt]  # [S, A]
                W[5 + 2 * b:A * F:F, :S] = (cand // 256).T
                W[6 + 2 * b:A * F:F, :S] = (cand % 256).T
        self._p_noise = 0.0
        if self._noise:
            from ..envs.compiled import TableState
            from ..envs.whisky_gold import STUMBLE_PROB, WhiskyGold

            assert isinstance(cenv.base, WhiskyGold), (
                f"{cenv.name}: unknown action-noise env for the kernel"
            )
            self._p_noise = float(STUMBLE_PROB)
            states = jax.vmap(cenv.base_state)(
                TableState(idx=jnp.arange(S, dtype=jnp.int32),
                           t=jnp.zeros((S,), jnp.int32))
            )
            W[A * F, :S] = np.asarray(states.drunk, np.float32)
        if np.array_equal(W.astype(jnp.bfloat16).astype(np.float32), W):
            dtype = jnp.bfloat16
        else:
            dtype = jnp.float32
        self._w = jnp.asarray(W, dtype)
        self._static = (
            self.S_pad, A, F, self.max_steps, self._mode,
            int(self._r0), int(self._r1), self._noise, self._dry_nbits,
            lane_block,
        )

    def reset(self, key) -> Tuple[jnp.ndarray, ...]:
        """Initial coins: ``bernoulli(key, 0.5, [N])`` selects the reset
        state per lane (engine's own protocol — module doc)."""
        n = self.n_envs
        if self._mode:
            bit = jax.random.bernoulli(key, 0.5, (1, n))
            idx0 = jnp.where(
                bit, jnp.int32(self._r1), jnp.int32(self._r0)
            )
        else:
            idx0 = jnp.full((1, n), self._r0, jnp.int32)
        z_i = jnp.zeros((1, n), jnp.int32)
        z_f = jnp.zeros((1, n), jnp.float32)
        return (idx0, z_i, z_f, z_f, z_i)

    def draw_bits(self, k_bits, n_steps: int, n: int):
        """The ``bits`` stream of the documented protocol: packed
        per-tomato dry masks for drying envs, reset coins otherwise.
        Shared with the fused trainers' k_bits slot."""
        if self._dry_nbits:
            dry = jax.random.bernoulli(
                k_bits, self._p_dry, (n_steps, n, self._dry_nbits)
            )
            return jnp.sum(
                dry.astype(jnp.int32) << jnp.arange(self._dry_nbits), -1
            )
        return jax.random.bernoulli(
            k_bits, 0.5, (n_steps, n)
        ).astype(jnp.int32)

    def draw_streams(self, key, n_steps: int):
        """The documented bulk-draw protocol (module doc)."""
        k_act, k_bits, k_stm, k_rand = jax.random.split(key, 4)
        T, n = n_steps, self.n_envs
        actions = jax.random.randint(k_act, (T, n), 0, self.A)
        bits = self.draw_bits(k_bits, T, n)
        stumble = jax.random.bernoulli(
            k_stm, self._p_noise, (T, n)
        ).astype(jnp.int32)
        rand_a = jax.random.randint(k_rand, (T, n), 0, self.A)
        return actions, bits, stumble, rand_a

    def run_streams(self, state, actions, bits, stumble, rand_a):
        """Raw stream entry point (host-replay tests)."""
        return _run(self._static, self._w, state, actions, bits, stumble,
                    rand_a)

    def run_random_reduced(self, state, key, n_steps: int):
        outs = self.run_streams(state, *self.draw_streams(key, n_steps))
        (idx, t, epr, eph, epl, racc, eacc, facc) = outs
        acc = {
            "reward_sum": racc.sum(),
            "episodes": eacc.sum().astype(jnp.int32),
            "finished_return_sum": facc.sum(),
        }
        return (idx, t, epr, eph, epl), acc


class ShardedPallasStochRolloutEngine:
    """Multi-device stochastic rollout: ``shard_map`` around the kernel
    over the mesh's ``data`` axis — the stochastic counterpart of
    ``rollout_kernel.ShardedPallasRolloutEngine``. The kernel is still
    purely lane-parallel (the draw streams are per-lane too), so sharding
    is lane partitioning with zero collectives; every stream is drawn
    GLOBALLY under the single-device protocol and lane-split, making
    per-lane results bitwise-identical to the single-device engine
    (tests/test_stoch_rollout_kernel.py sharded leg)."""

    def __init__(self, cenv: CompiledEnv, n_envs: int, mesh,
                 lane_block: int = 4096):
        from ..parallel.mesh import DATA_AXIS

        self.mesh = mesh
        self.axis = DATA_AXIS
        self.n_dev = mesh.shape[DATA_AXIS]
        if n_envs % self.n_dev:
            raise ValueError(
                f"n_envs {n_envs} must be a multiple of the data-axis size "
                f"{self.n_dev}"
            )
        self.local = PallasStochRolloutEngine(
            cenv, n_envs // self.n_dev, lane_block
        )
        # A second engine at the GLOBAL lane count supplies the reset /
        # draw protocol (identical payload; only n_envs differs), so the
        # sharded run consumes exactly the single-device streams.
        self._wide = PallasStochRolloutEngine(cenv, n_envs, lane_block)
        self.cenv = cenv
        self.n_envs = n_envs
        self.A = self.local.A

    def reset(self, key):
        return self._wide.reset(key)

    def run_streams(self, state, actions, bits, stumble, rand_a):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        lanes = P(None, self.axis)
        repl = P(None, None)
        local_static = self.local._static

        def shard_fn(w, st, a, b, sm, ra):
            return _run(local_static, w, st, a, b, sm, ra)

        return shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(repl, (lanes,) * 5, lanes, lanes, lanes, lanes),
            out_specs=(lanes,) * 8,
            check_vma=False,
        )(self.local._w, state, actions, bits, stumble, rand_a)

    def draw_streams(self, key, n_steps: int):
        return self._wide.draw_streams(key, n_steps)

    def run_random_reduced(self, state, key, n_steps: int):
        outs = self.run_streams(state, *self.draw_streams(key, n_steps))
        (idx, t, epr, eph, epl, racc, eacc, facc) = outs
        acc = {
            "reward_sum": racc.sum(),
            "episodes": eacc.sum().astype(jnp.int32),
            "finished_return_sum": facc.sum(),
        }
        return (idx, t, epr, eph, epl), acc
