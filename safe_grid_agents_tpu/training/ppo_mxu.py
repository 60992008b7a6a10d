"""PPO over the MXU fused rollout engine (round-3 flagship perf path).

The base :class:`~.ppo.PPOTrainer` at island/4096 spends ~105 ms per
64-step chunk (tools/diag.py ppo-decomp): collect ~28 ms (per-step overhead, not
the env), the permutation sort ~6 ms/epoch, minibatch gathers ~1.5 ms each,
and per-update fwd/bwd/adam ~3 ms — all latency-bound at this geometry
(the whole net is a 2×128-wide MLP; the MXU is idle >95% of the time).
This trainer removes every latency source that is not the algorithm:

* **collect** rides :class:`~..envs.mxu.MXUVecEnv` with index-native
  rollout states (a ``TableState`` is two i32 scalars per lane — no plane
  pytrees anywhere), with the SAME action-key discipline as
  ``PPOTrainer.collect`` so trajectories are bitwise-identical;
* **mode="parity"** then runs the base trainer's exact optimize
  (permutation + gathered minibatches, pytree adam): the whole chunk is
  bitwise-equal to ``PPOTrainer`` over ``VecEnv`` on the same compiled env
  (tests/test_ppo_mxu.py) — the proof the fast path optimizes the same
  algorithm;
* **mode="fast"** (default) replaces the data motion, not the math:
  - minibatches shuffle at TILE granularity: each epoch permutes
    32-element tiles of the time-major flat rollout (a tile = 32
    adjacent lanes at one timestep) and minibatches take contiguous runs
    of the permuted tile order — the sort shrinks to B/32 elements and
    the data motion to contiguous row gathers, while membership stays
    near-i.i.d. across time AND lanes. The two cheaper layouts tried
    first both destabilize island late in training (env-block: collapses
    after the entropy anneal; time-block: collapses when the near-
    deterministic policy phase-aligns the lockstep lanes, starving each
    minibatch of time diversity) — stability selected the tile shuffle;
  - the optimizer runs on ``ravel_pytree``-flattened params: one fused
    elementwise adam + one global-norm clip over a single vector instead
    of ~10 small kernels per leaf (identical math to per-leaf adam modulo
    float reassociation of the global norm);
  - the collect and minibatch scans are unrolled (``unroll``) to amortize
    per-iteration dispatch overhead.

The fast mode's minibatch membership differs from the reference protocol
(a tile-granular shuffle instead of an element-granular one) — a documented reordering, not an
algorithm change; the island preset's 45/45 learning gate is re-verified on
this path (RESULTS.md). Reference: SURVEY.md §3.2 ppo_learn; BASELINE.md
config 4 (PPO island actor-learner on device).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..agents.ppo import PPOAgent, PPOState
from ..envs.compiled import TableState
from ..envs.mxu import MXUState, MXUVecEnv
from .common import ChunkStats
from .ppo import PPOTrainer, _whiten, compute_gae
from .tabular_mxu import _accumulate


class MXUPPOTrainer(PPOTrainer):
    """Drop-in counterpart of ``PPOTrainer`` running on ``MXUVecEnv``."""

    def __init__(
        self,
        agent: PPOAgent,
        mxu: MXUVecEnv,
        cheat: bool = False,
        mode: str = "fast",
        unroll: int = 4,
    ):
        assert mode in ("fast", "parity"), mode
        super().__init__(agent, mxu, cheat=cheat)
        self.mode = mode
        self.unroll = unroll
        # Unravel closure for the flat-param optimizer (static pytree shape).
        p0 = agent.init(jax.random.PRNGKey(0)).params
        self._flat0, self._unravel = ravel_pytree(p0)

    def init(self, key) -> Tuple[PPOState, MXUState]:
        ka, kv = jax.random.split(key)
        astate = self.agent.init(ka)
        if self.mode == "fast":
            astate = astate.replace(
                opt_state=self.agent.tx.init(ravel_pytree(astate.params)[0])
            )
        return astate, self.vec.reset(kv)

    # -- rollout collection (same key discipline as PPOTrainer.collect) ----
    def collect(self, astate: PPOState, mstate: MXUState, key, n_steps: int):
        agent = self.agent

        def body(carry, _):
            st, k, stats = carry
            k, ka = jax.random.split(k)
            pre = TableState(idx=st.idx, t=st.t)
            action, logp, value = agent.sample_action(astate.params, pre, ka)
            st, out = self.vec.step(st, action)
            reward = out["hidden_reward"] if self.cheat else out["reward"]
            step_data = {
                "states": pre,
                "actions": action,
                "old_logp": logp,
                "values": value,
                "rewards": reward,
                "observed": out["reward"],
                "hidden": out["hidden_reward"],
                "dones": out["done"],
                "next_idx": out["next_idx"],
            }
            return (st, k, _accumulate(stats, out)), step_data

        (mstate, key, stats), traj = jax.lax.scan(
            body,
            (mstate, key, ChunkStats.zero()),
            None,
            length=n_steps,
            unroll=self.unroll if self.mode == "fast" else 1,
        )
        return mstate, key, stats, traj

    # -- fast optimize: tile-shuffled minibatches + flat-param adam ----------
    TILE = 32  # flat elements per shuffle tile (contiguous lanes of one step)

    def optimize_fast(
        self, astate: PPOState, flat: dict, key, batch_size: int,
        axis_name: str | None = None, entropy_coef=None,
    ):
        """``flat`` leaves are time-major [B]; each epoch permutes fixed
        TILE-element tiles of the flat arrays (one tile = TILE adjacent env
        lanes at one timestep) and minibatches take contiguous runs of the
        permuted tile order. This is the uniform shuffle at tile
        granularity: the sort is over B/TILE elements (~1% of the full
        permutation's radix-sort cost — the base optimize's 6 ms/epoch
        wall) and the per-minibatch data motion is contiguous row gathers
        instead of element gathers. Minibatch membership is near-i.i.d.
        across both time and lanes — full time diversity per minibatch,
        which pure time-block slices lack once near-deterministic policies
        phase-align the lockstep lanes (the measured island late-training
        collapse; RESULTS.md). Under a data axis the grads are pmean-ed per
        minibatch exactly like the base optimize."""
        agent = self.agent
        n_mb = agent.n_minibatches
        mb_size = batch_size // n_mb
        tile = self.TILE
        while mb_size % tile:
            tile //= 2
        # Like the base optimize, a batch that doesn't divide into n_mb
        # minibatches drops the remainder (the base never selects the
        # trailing perm entries; here the trailing elements are sliced off
        # before tiling — n_mb·mb_size is always tile-divisible).
        used = n_mb * mb_size
        n_tiles = used // tile
        mb_tiles = mb_size // tile
        flat_t = jax.tree.map(
            lambda x: x[:used].reshape(n_tiles, tile), flat
        )
        flat_p = ravel_pytree(astate.params)[0]

        def loss_flat(fp, mb):
            return agent.loss(self._unravel(fp), mb, entropy_coef)

        def epoch(carry, e):
            p, opt_state = carry
            perm = jax.random.permutation(jax.random.fold_in(key, e), n_tiles)

            def minibatch(carry, i):
                p, opt_state = carry
                rows = jax.lax.dynamic_slice_in_dim(
                    perm, i * mb_tiles, mb_tiles
                )
                mb = jax.tree.map(
                    lambda x: x[rows].reshape(mb_size), flat_t
                )
                loss, g = jax.value_and_grad(loss_flat)(p, mb)
                if axis_name is not None:
                    g = jax.lax.pmean(g, axis_name)
                    loss = jax.lax.pmean(loss, axis_name)
                updates, opt_state = agent.tx.update(g, opt_state, p)
                return (p + updates, opt_state), loss

            (p, opt_state), losses = jax.lax.scan(
                minibatch, (p, opt_state), jnp.arange(n_mb),
                unroll=self.unroll,
            )
            return (p, opt_state), losses.mean()

        (flat_p, opt_state), losses = jax.lax.scan(
            epoch, (flat_p, astate.opt_state), jnp.arange(agent.epochs)
        )
        return self._unravel(flat_p), opt_state, losses.mean()

    # -- full chunk ----------------------------------------------------------
    def train_chunk(
        self,
        astate: PPOState,
        mstate: MXUState,
        key,
        n_steps: int,
        axis_name: str | None = None,
    ):
        agent = self.agent
        mstate, key, stats, traj = self.collect(astate, mstate, key, n_steps)

        _, last_value = agent.policy_value(
            astate.params, TableState(idx=mstate.idx, t=mstate.t)
        )
        advantages, returns = compute_gae(
            traj["rewards"], traj["values"], traj["dones"], last_value,
            agent.discount, agent.gae_lambda,
        )
        advantages = _whiten(advantages, axis_name)

        batch_size = n_steps * traj["actions"].shape[1]

        # Time-major flatten for BOTH modes. parity: + the base optimize →
        # bitwise-equal to PPOTrainer over VecEnv on the same compiled env.
        # fast: + the tile-shuffled optimize (optimize_fast doc).
        def flatten(x):
            return x.reshape((batch_size,) + x.shape[2:])

        flat = {
            "states": jax.tree.map(flatten, traj["states"]),
            "actions": flatten(traj["actions"]),
            "old_logp": flatten(traj["old_logp"]),
            "advantages": flatten(advantages),
            "returns": flatten(returns),
        }
        key, ko = jax.random.split(key)
        opt = self.optimize if self.mode == "parity" else self.optimize_fast
        params, opt_state, loss = opt(
            astate, flat, ko, batch_size, axis_name=axis_name,
            entropy_coef=agent.entropy_coef(astate.step),
        )
        astate = PPOState(
            params=params, opt_state=opt_state, step=astate.step + batch_size
        )
        return astate, mstate, stats, loss

    def eval_chunk(self, astate, mstate, key, n_steps, min_episodes=None):
        from .common import eval_chunk

        return eval_chunk(
            self.vec, self.agent.act, astate, mstate, key, n_steps,
            min_episodes=min_episodes,
            state_view=lambda st: TableState(idx=st.idx, t=st.t),
            accumulate=_accumulate,
        )


class MXUCRMDPTrainer(MXUPPOTrainer):
    """PPO-CRMDP over the MXU engine (counterpart of
    :class:`~.crmdp.CRMDPTrainer`): the corruption-attribution NLMS update
    and reward relabel run between collect and optimize, on the arrival
    indices the MXU step already emits (``next_idx``)."""

    def __init__(self, agent, mxu: MXUVecEnv, mode: str = "fast",
                 unroll: int = 4, cheat: bool = False):
        # CRMDP trains on observed rewards (relabeled) — cheat is
        # meaningless. The kwarg is accepted (and rejected loudly) so the
        # PallasPPOTrainer.__init__ chain can pass through this class in
        # PallasCRMDPTrainer's MRO (training/ppo_pallas.py).
        assert not cheat, "CRMDP trains on observed (relabeled) rewards"
        super().__init__(agent, mxu, cheat=False, mode=mode, unroll=unroll)

    def train_chunk(
        self, astate, mstate: MXUState, key, n_steps: int,
        axis_name: str | None = None,
    ):
        from ..agents.crmdp import CRMDPState

        agent = self.agent
        mstate, key, stats, traj = self.collect(astate, mstate, key, n_steps)

        corruption = agent.update_corruption(
            astate.corruption, traj["next_idx"], traj["observed"],
            traj["hidden"], axis_name=axis_name,
        )
        relabeled = agent.relabel(corruption, traj["rewards"], traj["next_idx"])

        _, last_value = agent.policy_value(
            astate.params, TableState(idx=mstate.idx, t=mstate.t)
        )
        advantages, returns = compute_gae(
            relabeled, traj["values"], traj["dones"], last_value,
            agent.discount, agent.gae_lambda,
        )
        advantages = _whiten(advantages, axis_name)

        batch_size = n_steps * traj["actions"].shape[1]

        def flatten(x):  # time-major in both modes (see MXUPPOTrainer)
            return x.reshape((batch_size,) + x.shape[2:])

        flat = {
            "states": jax.tree.map(flatten, traj["states"]),
            "actions": flatten(traj["actions"]),
            "old_logp": flatten(traj["old_logp"]),
            "advantages": flatten(advantages),
            "returns": flatten(returns),
        }
        key, ko = jax.random.split(key)
        opt = self.optimize if self.mode == "parity" else self.optimize_fast
        params, opt_state, loss = opt(
            astate, flat, ko, batch_size, axis_name=axis_name,
            entropy_coef=agent.entropy_coef(astate.step),
        )
        astate = CRMDPState(
            params=params, opt_state=opt_state,
            step=astate.step + batch_size, corruption=corruption,
        )
        return astate, mstate, stats, loss
