"""Compiled tabular engine: whole environments as lookup tables.

The TPU-first observation behind this module: every safety gridworld here has
an *enumerable* state space (``Env.num_states`` ≤ a few thousand — each env
already provides a perfect hash for tabular Q). So instead of executing the
env's masked-arithmetic step per transition, we enumerate the reachable state
graph ONCE at build time and bake it into dense tables:

    next_idx [S, A] i32   reward [S, A] f32   hidden [S, A] f32
    done     [S, A] bool  obs    [S, P, H, W] f32   board [S, H, W] i8

after which a vectorized env step is three gathers and a timeout compare, an
observation is ONE gather, and XLA fuses the whole rollout scan into a pure
gather pipeline from VMEM-resident tables (the largest table set here is a
few MB — far under the ~16 MB/core VMEM budget, so HBM is never touched in
steady state). This is the "replaces the pycolab sprite/drape step with a
pure array transition" north star (BASELINE.json) taken to its limit.

Parity is by construction: tables are filled by calling the base env's own
step, and the runtime consumes RNG keys identically (resets still call the
base env's ``reset``/``carry_reset``). Per-step randomness compiles through
two hooks that run IN FRONT of the table gathers, consuming the same key the
base step would: ``noisy_action`` (whisky's drunk action corruption) and
``stochastic_index`` (tomato's drying applied straight to the watered bits
encoded in the state index — the deterministic move+water remainder is the
table). Envs whose stochastic support exceeds plain BFS reach (tomato:
drying clears bits BFS-from-reset would never clear) provide
``enumerate_states`` to seed the build. ``tests/test_compiled.py`` checks
bitwise agreement engine-vs-compiled on random rollouts for every
compileable alias.

Round 3 closes the last aliases: friend_foe* compiles through its
bounded-memory formulation (``friend_foe.BoundedFriendFoe``) — the
adversary's placement reads only the sign of the choice-count difference,
so the clamped difference is a finite sufficient statistic, bitwise-equal
to the unbounded array engine for any run of fewer than ``cap`` episodes
per instance (tests/test_friend_compiled.py); ``make_env(alias,
compiled=True)`` substitutes the bounded base automatically
(COMPILE_SUBSTITUTE below). sokoban2 (two-box) compiles directly — 15,588
reachable states of a 175,616-slot hash space; its dense obs table lives
in HBM rather than VMEM, which only matters to observation-rendering
agents.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..types import StepOut
from .base import Env
from .whisky_gold import WhiskyGold


@struct.dataclass
class TableState:
    idx: jnp.ndarray  # i32 — state index into the tables
    t: jnp.ndarray    # i32 — episode step count (timeout only)


class CompiledEnv(Env):
    """Lookup-table execution of a deterministic base env."""

    def __init__(self, base: Env):
        assert base.num_states is not None, f"{base.name}: not enumerable"
        self.base = base
        self.name = f"{base.name}+compiled"
        self.n_actions = base.n_actions
        self.height, self.width = base.height, base.width
        self.n_planes = base.n_planes
        self.max_steps = base.max_steps
        self.num_states = base.num_states
        self._noisy = isinstance(base, WhiskyGold)
        self._stochastic_index = hasattr(base, "stochastic_index")
        self._build()

    # -- build -------------------------------------------------------------
    def _step_fn(self):
        if hasattr(self.base, "deterministic_step"):
            return lambda s, a: self.base.deterministic_step(s, a)
        key = jax.random.PRNGKey(0)
        return lambda s, a: self.base.step(s, a, key)

    def _build(self):
        # Build on the CPU backend: BFS frontiers have many shapes and the
        # tables are tiny — compiling each frontier size for the TPU would
        # dominate build time.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            self._build_tables()

    @staticmethod
    def _pad_pow2(n: int) -> int:
        p = 1
        while p < n:
            p *= 2
        return p

    def _build_tables(self):
        base, S, A = self.base, self.num_states, self.n_actions
        step = jax.jit(jax.vmap(self._step_fn(), in_axes=(0, 0)))
        v_index = jax.jit(jax.vmap(base.state_index))
        v_obs = jax.jit(jax.vmap(base.observe))
        v_board = jax.jit(jax.vmap(base.board))

        # Determinism check: stepping with many different keys must agree
        # bitwise (catches stochastic dynamics like tomato drying, where a
        # single alternate key could coincidentally match).
        if not hasattr(base, "deterministic_step"):
            s0 = base.reset(jax.random.PRNGKey(3))
            a0 = jnp.int32(0)
            ref = base.step(s0, a0, jax.random.PRNGKey(100))
            for probe in range(101, 133):
                o2 = base.step(s0, a0, jax.random.PRNGKey(probe))
                same = jax.tree.all(
                    jax.tree.map(lambda x, y: bool(jnp.all(x == y)), ref, o2)
                )
                if not same:
                    raise ValueError(
                        f"{base.name}: step consumes randomness — not compileable"
                    )

        # Discover the reset-state support (stochastic resets like absent /
        # interrupt have several) by probing keys; dedup by index.
        probes = [base.reset(jax.random.PRNGKey(i)) for i in range(32)]
        seen: Dict[int, Any] = {}
        for st in probes:
            seen.setdefault(int(base.state_index(st)), st)
        if hasattr(base, "enumerate_states"):
            # Runtime stochastic hooks (tomato drying) can reach states BFS
            # from resets never visits — seed the build with the env's full
            # valid-state enumeration.
            batch = base.enumerate_states()
            idxs = np.asarray(v_index(batch))
            host = jax.tree.map(np.asarray, batch)
            for j, i in enumerate(idxs):
                seen.setdefault(
                    int(i), jax.tree.map(lambda x: jnp.asarray(x[j]), host)
                )

        # BFS over the reachable graph, batched per frontier.
        store: Dict[int, Any] = dict(seen)
        frontier: List[int] = list(seen)
        nxt = np.zeros((S, A), np.int32)
        rew = np.zeros((S, A), np.float32)
        hid = np.zeros((S, A), np.float32)
        done = np.zeros((S, A), bool)
        info0 = None
        infos: Dict[str, np.ndarray] = {}
        visited = set(frontier)
        while frontier:
            n = len(frontier)
            n_pad = self._pad_pow2(n)  # bound jit recompiles to log2 sizes
            padded = frontier + [frontier[0]] * (n_pad - n)
            states = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[store[i] for i in padded]
            )
            new_frontier: List[int] = []
            for a in range(A):
                out = step(states, jnp.full((n_pad,), a, jnp.int32))
                idxs = np.asarray(v_index(out.state))[:n]
                fr = np.asarray(frontier)
                nxt[fr, a] = idxs
                rew[fr, a] = np.asarray(out.reward)[:n]
                hid[fr, a] = np.asarray(out.hidden_reward)[:n]
                # Strip the timeout component: BFS states carry t=0, so the
                # base env's done here is the pure env-terminal signal
                # (max_steps ≥ 1 always holds).
                done[fr, a] = np.asarray(out.done)[:n] & (
                    np.asarray(out.state.t)[:n] < self.max_steps
                )
                if info0 is None:
                    info0 = {
                        k: np.zeros((S, A), np.asarray(v).dtype)
                        for k, v in out.info.items()
                    }
                    infos = info0
                for k, v in out.info.items():
                    infos[k][fr, a] = np.asarray(v)[:n]
                # Expand ALL successors — including post-terminal states, so
                # stepping past `done` (which auto-reset never does, but the
                # raw API allows) matches the base env bitwise too.
                # Store successors with t reset to 0 (state_index ignores t;
                # keeping accumulated t would eventually poison the timeout-
                # stripping predicate above for deep states).
                host_state = jax.tree.map(np.asarray, out.state)
                for j, i_new in enumerate(idxs):
                    i_new = int(i_new)
                    if i_new not in visited:
                        visited.add(i_new)
                        new_frontier.append(i_new)
                        store[i_new] = jax.tree.map(
                            lambda x: jnp.asarray(x[j]), host_state
                        ).replace(t=jnp.int32(0))
            frontier = new_frontier

        self.next_table = nxt
        self.reward_table = rew
        self.hidden_table = hid
        self.done_table = done
        self.info_tables = infos
        self.reachable = np.array(sorted(visited), np.int32)

        # Dense state store + render tables over the reachable set, scattered
        # into index space (unreachable rows stay zero — never gathered).
        reach_states = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[store[i] for i in self.reachable]
        )
        obs_r = np.asarray(v_obs(reach_states))
        board_r = np.asarray(v_board(reach_states))
        self.obs_table = np.zeros((S,) + obs_r.shape[1:], np.float32)
        self.obs_table[self.reachable] = obs_r
        self.board_table = np.zeros((S,) + board_r.shape[1:], np.int8)
        self.board_table[self.reachable] = board_r
        # Full-state store for reconstruction (drunk flag for whisky noise,
        # debugging, and parity tooling).
        self.state_store = jax.tree.map(
            lambda leaf: np.array(
                jnp.zeros((S,) + leaf.shape[1:], leaf.dtype)
                .at[jnp.asarray(self.reachable)]
                .set(leaf)
            ),
            reach_states,
        )

    # -- runtime -----------------------------------------------------------
    def base_state(self, state: TableState):
        """Reconstruct the base env's State pytree (t from the counter)."""
        full = jax.tree.map(lambda tab: jnp.asarray(tab)[state.idx], self.state_store)
        return full.replace(t=state.t)

    def reset(self, key) -> TableState:
        st = self.base.reset(key)
        return TableState(idx=self.base.state_index(st), t=jnp.int32(0))

    def carry_reset(self, state: TableState, key) -> TableState:
        st = self.base.carry_reset(self.base_state(state), key)
        return TableState(idx=self.base.state_index(st), t=jnp.int32(0))

    def step(self, state: TableState, action, key) -> StepOut:
        if self._noisy:
            action = self.base.noisy_action(self.base_state(state), action, key)
        i, a = state.idx, action
        if self._stochastic_index:
            # Same draw the base step consumes (tomato: drying), applied to
            # the index bits; the gathers below are the deterministic rest.
            i = self.base.stochastic_index(i, key)
        t = state.t + 1
        done = jnp.asarray(self.done_table)[i, a] | self._timeout(t)
        return StepOut(
            state=TableState(idx=jnp.asarray(self.next_table)[i, a], t=t),
            reward=jnp.asarray(self.reward_table)[i, a],
            hidden_reward=jnp.asarray(self.hidden_table)[i, a],
            done=done,
            info={k: jnp.asarray(v)[i, a] for k, v in self.info_tables.items()},
        )

    def observe(self, state: TableState) -> jnp.ndarray:
        return jnp.asarray(self.obs_table)[state.idx]

    def board(self, state: TableState) -> jnp.ndarray:
        return jnp.asarray(self.board_table)[state.idx]

    def state_index(self, state: TableState) -> jnp.ndarray:
        return state.idx


COMPILEABLE = [
    "shift",
    "shift-test",
    "island",
    "sokoban",
    "sokoban2",
    "boat",
    "tomato",
    "tomato-crmdp",
    "whisky",
    "absent",
    "interrupt",
    "conveyor",
    "conveyor-sushi",
    "friend",
    "foe",
    "neutral",
    "corners",
    "way",
    "toy",
]

# Aliases whose ARRAY-engine base is not finite-state but which compile
# through an exactly-equivalent-within-bound substitute (module doc).
COMPILE_SUBSTITUTE = {
    "friend": lambda **kw: _bounded_friend("friend", **kw),
    "foe": lambda **kw: _bounded_friend("foe", **kw),
    "neutral": lambda **kw: _bounded_friend("neutral", **kw),
}


def _bounded_friend(variant: str, **kw):
    from .friend_foe import BoundedFriendFoe

    return BoundedFriendFoe(variant=variant, **kw)


def compile_env(base: Env) -> CompiledEnv:
    return CompiledEnv(base)
