"""MXU fused rollout: compiled-env stepping as one-hot matmuls.

Round-2 finding (PERF.md "measurement notes"): on the axon platform a single
4096-lane gather costs ~23 us of real device time, while a one-hot [N, S]
matmul against the packed payload table costs ~3 us — the MXU path is the
true speed-of-light step for table-compiled envs, inverting round 1's
(async-ack-corrupted) conclusion that gathers win.

Design: for a :class:`~.compiled.CompiledEnv` whose reset is deterministic
(same start state for every key — shift, island, sokoban, boat, conveyor,
corners/way/toy), one env step over N lanes is

    oh  = one_hot(idx, S)                      # [N, S]  VPU compare
    y   = oh @ W                               # [N, A*F] MXU
    f   = sum(y.reshape(N, A, F) * one_hot(a, A)[:, :, None], axis=1)

where ``W`` packs the compiled tables column-blocked per action with fields
F = (next_idx, reward, hidden_reward, done). Every output is EXACT: one-hot
rows make each dot a plain table read (bf16 path used only when the whole
payload is bf16-representable; otherwise f32 with Precision.HIGHEST), so the
fused rollout is bitwise-identical to ``VecEnv`` over the same actions
(tests/test_mxu.py).

Scope: ALL 15 compiled aliases. Deterministic envs run the pure matmul path
(no keys anywhere — the headline bench configuration). Envs with randomness
run the same matmul core in *stochastic mode*, which carries per-instance
RNG keys with EXACTLY ``VecEnv``'s split discipline, so every stochastic
alias is bitwise-identical to ``VecEnv`` over the same reset key and action
matrix (tests/test_mxu.py):

* stochastic reset (absent's supervisor, interrupt's arming): the reset
  draw is one ``bernoulli(key, 0.5)`` → the reset index is a 2-way select
  between the two probed reset states;
* carried-state reset (friend/foe/neutral via ``BoundedFriendFoe``, round
  4): ``carry_reset`` reads the terminal state (the adversary's carried
  imbalance) plus one coin — a function ``(successor idx, bit) → idx``.
  Two carry tables (one per coin bit) are built by probing the compiled
  env's own ``carry_reset`` over every reachable state, composed with
  ``next_table`` and PACKED INTO THE STEP PAYLOAD as two extra matmul
  fields, so the per-lane reset candidate pair comes out of the same
  one-hot matmul as the transition — the runtime reset stays a 2-way
  select, now between per-lane values. Single-coin dependence is
  validated against fresh probes at build time. Index-keyed tabular Q
  stays off this family (the index encodes the hidden reward box;
  cli/main.py rejects it loudly);
* whisky's drunk action noise: the drunk flag is read with a one-hot
  matvec against a [S] flag vector and the stumble/random-action draws
  replicate ``noisy_action`` from the same ``k_step``;
* tomato's drying: ``stochastic_index`` (bit-clears on the index) runs in
  front of the one-hot, same draw as the compiled step.

Reference parity note: this module replaces the pycolab sprite step
(SURVEY.md §2b "pycolab engine") on the benchmark path; behavior is pinned
by the compiled tables, which are themselves parity-tested against the
array engine and the NumPy oracle.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .compiled import CompiledEnv


@struct.dataclass
class MXUState:
    idx: jnp.ndarray        # [N] i32 state index
    t: jnp.ndarray          # [N] i32 episode step count
    ep_return: jnp.ndarray  # [N] f32
    ep_hidden: jnp.ndarray  # [N] f32
    ep_len: jnp.ndarray     # [N] i32
    key: jnp.ndarray        # [N, 2] u32 per-instance keys (stochastic mode;
                            # zeros and unused in the deterministic path)


class MXUVecEnv:
    """N lockstep instances of a compiled env, stepped via MXU matmuls.

    Matches ``VecEnv`` field-for-field on (reward, hidden_reward, done,
    finished_return, finished_hidden, finished_len) and on the final
    (state_index, t) — the parity test drives both with one action matrix.
    """

    N_FIELDS = 4  # next_idx, reward, hidden, done (6 with carry candidates)

    def __init__(self, cenv: CompiledEnv, n_envs: int):
        self.cenv = cenv
        self.n_envs = n_envs
        self.S, self.A = cenv.num_states, cenv.n_actions
        self.max_steps = int(cenv.max_steps)
        self._noisy = cenv._noisy
        self._stoch_index = cenv._stochastic_index

        # Reset support: probe carry_reset from several reachable states and
        # reset() under several keys. One index → deterministic reset (the
        # pure-matmul headline path). Two indices → the reset draw is the
        # env's documented single bernoulli(key, 0.5) (absent supervisor /
        # interrupt arming): map bit → index by probing a known-True and a
        # known-False key so the runtime reset is a 2-way select.
        from .compiled import TableState

        idxs = set()
        probe_states = cenv.reachable[:: max(1, len(cenv.reachable) // 8)]
        for si in probe_states:
            st = TableState(idx=jnp.int32(int(si)), t=jnp.int32(0))
            for k in range(4):
                out = cenv.carry_reset(st, jax.random.PRNGKey(k))
                idxs.add(int(out.idx))
        for k in range(8):
            idxs.add(int(cenv.reset(jax.random.PRNGKey(k)).idx))
        self._carried_reset = False
        if len(idxs) == 1:
            self._stoch_reset = False
            self.reset_idx = idxs.pop()
        elif len(idxs) == 2:
            self._stoch_reset = True
            self.reset_idx_bit = [None, None]
            for s_probe in range(64):
                k = jax.random.PRNGKey(s_probe)
                bit = int(jax.random.bernoulli(k, 0.5))
                self.reset_idx_bit[bit] = int(cenv.reset(k).idx)
                if None not in self.reset_idx_bit:
                    break
            assert None not in self.reset_idx_bit, f"{cenv.name}: probe failed"
            assert set(self.reset_idx_bit) == idxs, (
                f"{cenv.name}: reset support {idxs} is not the documented "
                f"single-coin draw ({self.reset_idx_bit})"
            )
        else:
            # Reset support exceeds one coin: attempt the carried-state
            # formulation — carry_reset as a function of (state index, one
            # coin). Raises with the old message if the probes refute it.
            self._stoch_reset = True
            self._carried_reset = True
            self._probe_carried_reset(idxs)
        self._stochastic = self._noisy or self._stoch_index or self._stoch_reset

        # Payload fields per action: the transition quadruple, plus — for
        # carried-reset envs — the two carry-reset candidates of the
        # SUCCESSOR state (carry_tab[bit] ∘ next_table), so the runtime
        # reset select needs no extra gathers.
        F = 6 if self._carried_reset else 4
        self.N_FIELDS = F
        W = np.zeros((self.S, self.A * F), np.float32)
        W[:, 0::F] = cenv.next_table.astype(np.float32)
        W[:, 1::F] = cenv.reward_table
        W[:, 2::F] = cenv.hidden_table
        W[:, 3::F] = cenv.done_table.astype(np.float32)
        if self._carried_reset:
            W[:, 4::F] = self._carry_tab[0][cenv.next_table].astype(np.float32)
            W[:, 5::F] = self._carry_tab[1][cenv.next_table].astype(np.float32)
        bf = W.astype(jnp.bfloat16).astype(np.float32)
        if np.array_equal(bf, W):
            self._dtype = jnp.bfloat16
            self._precision = jax.lax.Precision.DEFAULT
        else:
            self._dtype = jnp.float32
            self._precision = jax.lax.Precision.HIGHEST
        self._W = jnp.asarray(W, self._dtype)

    # -- build helpers -----------------------------------------------------
    def _probe_carried_reset(self, support):
        """Carried-state reset (friend family): verify ``carry_reset`` is a
        function of (state index, one coin) and bake it into two [S] tables.

        Probes the compiled env's own ``carry_reset`` — identical draws by
        construction. Raises the MXU-ineligibility error if any probe
        contradicts the single-coin model (e.g. a second draw, or key
        dependence beyond the coin)."""
        from .compiled import TableState

        cenv = self.cenv
        # Keys with known coin bits (the one bernoulli(key, 0.5) draw).
        key_bit = [None, None]
        for s in range(64):
            k = jax.random.PRNGKey(s)
            key_bit[int(jax.random.bernoulli(k, 0.5))] = k
            if None not in key_bit:
                break
        assert None not in key_bit

        reach = jnp.asarray(cenv.reachable)

        def carry_idx(i, k):
            return cenv.carry_reset(TableState(idx=i, t=jnp.int32(0)), k).idx

        v_carry = jax.jit(jax.vmap(carry_idx, in_axes=(0, None)))
        tabs = np.zeros((2, self.S), np.int32)
        for b in (0, 1):
            out = np.asarray(v_carry(reach, key_bit[b]))
            tabs[b, np.asarray(cenv.reachable)] = out

        # Validate single-coin dependence over ALL reachable states (the
        # vmapped probe is cheap) with several fresh keys AND at t > 0:
        # eligibility is probabilistic — decided by probing, not proof — so
        # cover the whole reachable set and the step counter, refusing
        # loudly if any probe contradicts the (idx, one-coin) model.
        def carry_idx_t(i, k, t):
            return cenv.carry_reset(TableState(idx=i, t=t), k).idx

        v_carry_t = jax.jit(
            jax.vmap(carry_idx_t, in_axes=(0, None, None))
        )
        reach_np = np.asarray(cenv.reachable)
        for s_probe in range(16):
            k = jax.random.PRNGKey(1009 + 131 * s_probe)
            bit = int(jax.random.bernoulli(k, 0.5))
            want = tabs[bit, reach_np]
            for t_probe in (0, 7):
                got = np.asarray(v_carry_t(reach, k, jnp.int32(t_probe)))
                if not np.array_equal(got, want):
                    raise ValueError(
                        f"{cenv.name}: carry_reset(t={t_probe}, key probe "
                        f"{s_probe}) contradicts the (idx, one-coin) model "
                        f"(reset support {sorted(support)}) — use VecEnv"
                    )
        self._carry_tab = tabs

        # Fresh reset (blank carried state) must itself be one coin draw.
        self.reset_idx_bit = [None, None]
        for s_probe in range(64):
            k = jax.random.PRNGKey(s_probe)
            bit = int(jax.random.bernoulli(k, 0.5))
            i = int(cenv.reset(k).idx)
            if self.reset_idx_bit[bit] is None:
                self.reset_idx_bit[bit] = i
            elif self.reset_idx_bit[bit] != i:
                raise ValueError(
                    f"{cenv.name}: fresh reset is not a single-coin draw "
                    "— use VecEnv"
                )
        assert None not in self.reset_idx_bit, f"{cenv.name}: probe failed"

    # -- core --------------------------------------------------------------
    def _reset_bits_to_idx(self, keys):
        """Per-instance reset indices from reset keys: the env's documented
        single coin draw selects between the two probed reset states."""
        bit = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5))(keys)
        return jnp.where(
            bit,
            jnp.int32(self.reset_idx_bit[1]),
            jnp.int32(self.reset_idx_bit[0]),
        )

    def reset(self, key) -> MXUState:
        n = self.n_envs
        if self._stochastic:
            # Replicate VecEnv.reset's key discipline exactly: per-instance
            # key → (env reset key, carried key).
            keys = jax.random.split(key, n)
            init = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
            if self._stoch_reset:
                idx0 = self._reset_bits_to_idx(init[:, 0])
            else:
                idx0 = jnp.full((n,), self.reset_idx, jnp.int32)
            carry = init[:, 1]
        else:
            del key  # deterministic reset — the pure-matmul headline path
            idx0 = jnp.full((n,), self.reset_idx, jnp.int32)
            carry = jnp.zeros((n, 2), jnp.uint32)
        return MXUState(
            idx=idx0,
            t=jnp.zeros((n,), jnp.int32),
            ep_return=jnp.zeros((n,), jnp.float32),
            ep_hidden=jnp.zeros((n,), jnp.float32),
            ep_len=jnp.zeros((n,), jnp.int32),
            key=carry,
        )

    def _fields(self, idx, actions):
        """One MXU step: exact (next_idx, reward, hidden, done[, carry01])
        per lane."""
        oh = jax.nn.one_hot(idx, self.S, dtype=self._dtype)
        y = jax.lax.dot_general(
            oh,
            self._W,
            (((1,), (0,)), ((), ())),
            precision=self._precision,
            preferred_element_type=jnp.float32,
        ).reshape(-1, self.A, self.N_FIELDS)
        a_oh = jax.nn.one_hot(actions, self.A, dtype=jnp.float32)
        # VPU select (mul+sum of exact f32 values) keeps bitwise exactness.
        f = (y * a_oh[:, :, None]).sum(axis=1)
        nxt = f[:, 0].astype(jnp.int32)
        done_env = f[:, 3] > 0.5
        return nxt, f[:, 1], f[:, 2], done_env, f

    def _step(self, state: MXUState, actions):
        if self._stochastic:
            # VecEnv._step1's key discipline, vectorized.
            ks = jax.vmap(lambda k: jax.random.split(k, 3))(state.key)
            k_step, k_reset, next_key = ks[:, 0], ks[:, 1], ks[:, 2]
            idx = state.idx
            if self._noisy:
                # Same code path CompiledEnv.step takes: reconstruct base
                # states (cheap [N] gathers) and call the env's own hook —
                # identical draws by construction.
                from .compiled import TableState

                bstates = self.cenv.base_state(
                    TableState(idx=state.idx, t=state.t)
                )
                actions = jax.vmap(self.cenv.base.noisy_action)(
                    bstates, actions, k_step
                )
            if self._stoch_index:
                idx = jax.vmap(self.cenv.base.stochastic_index)(idx, k_step)
            nxt, reward, hidden, done_env, f = self._fields(idx, actions)
            if self._carried_reset:
                # Per-lane 2-way select between the successor's carry-reset
                # candidates (payload fields 4/5); the coin is VecEnv's
                # exact carry_reset draw on k_reset.
                bit = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5))(k_reset)
                reset_idx = jnp.where(bit, f[:, 5], f[:, 4]).astype(jnp.int32)
            elif self._stoch_reset:
                reset_idx = self._reset_bits_to_idx(k_reset)
            else:
                reset_idx = jnp.int32(self.reset_idx)
        else:
            nxt, reward, hidden, done_env, _ = self._fields(state.idx, actions)
            reset_idx = jnp.int32(self.reset_idx)
            next_key = state.key
        t = state.t + 1
        done = done_env | (t >= self.max_steps)
        ep_return = state.ep_return + reward
        ep_hidden = state.ep_hidden + hidden
        ep_len = state.ep_len + 1
        new = MXUState(
            idx=jnp.where(done, reset_idx, nxt),
            t=jnp.where(done, 0, t),
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_hidden=jnp.where(done, 0.0, ep_hidden),
            ep_len=jnp.where(done, 0, ep_len),
            key=next_key,
        )
        out = dict(
            reward=reward,
            hidden_reward=hidden,
            done=done,
            finished_return=ep_return,
            finished_hidden=ep_hidden,
            finished_len=ep_len,
            # Pre-reset successor index (the terminal successor state) —
            # replay/TD learners bootstrap from this, masked by done.
            next_idx=nxt,
        )
        return new, out

    def step(self, state: MXUState, actions):
        """Public single-step API (mirrors VecEnv.step's (state, out))."""
        return self._step(state, actions)

    # -- public API (bench + parity) ----------------------------------------
    def run_actions(self, state: MXUState, actions_tn) -> Tuple[MXUState, dict]:
        """Scan a [T, N] action matrix; returns stacked per-step outputs."""
        return jax.lax.scan(self._step, state, actions_tn)

    def run_random_reduced(
        self, state: MXUState, key, n_steps: int
    ) -> Tuple[MXUState, dict]:
        """Bench path: presampled uniform actions (one [T, N] randint — the
        per-step split of ``VecEnv.run_random_reduced`` costs ~8 us/step of
        real device time), with the chunk totals accumulated in the carry."""
        actions = jax.random.randint(key, (n_steps, self.n_envs), 0, self.A)

        def body(carry, a_row):
            st, acc = carry
            st, out = self._step(st, a_row)
            acc = {
                "reward_sum": acc["reward_sum"] + out["reward"].sum(),
                "episodes": acc["episodes"] + out["done"].sum(),
                "finished_return_sum": acc["finished_return_sum"]
                + jnp.where(out["done"], out["finished_return"], 0.0).sum(),
            }
            return (st, acc), None

        acc0 = {
            "reward_sum": jnp.float32(0.0),
            "episodes": jnp.int32(0),
            "finished_return_sum": jnp.float32(0.0),
        }
        (state, acc), _ = jax.lax.scan(body, (state, acc0), actions)
        return state, acc
