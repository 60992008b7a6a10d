"""PPO with the optimize phase fused into a single pallas kernel per chunk.

Counterpart of :class:`~.ppo_mxu.MXUPPOTrainer` (fast mode) with the whole
epochs × minibatches update phase inside ONE kernel
(`ops/ppo_kernel.py`) — deleting the ~1.3 ms/update kernel-boundary
latency that PERF.md's round-3 decomposition pins as the optimize phase's
roof (~0.3 ms of actual matmul per update) — and the collect phase inside
another (`ops/ppo_collect_kernel.py` for deterministic-reset envs;
`ops/ppo_stoch_collect_kernel.py` for the stochastic aliases — round-5
closing, so every compiled alias runs both phases in kernels). GAE,
whitening, and the chunk plumbing are INHERITED UNCHANGED from
``MXUPPOTrainer``; ``optimize_fast`` reuses the exact tile-shuffle
permutation draws, so the two trainers optimize the same algorithm on the
same data order — float association (matmul tiling, per-tensor norm
partials) is the only difference, pinned by an allclose parity test
(tests/test_ppo_kernel.py). Collect rides the kernels' own bulk-draw
protocols (host-replay-gated).

Scope: ``net='table'`` actor-critic with two hidden layers on a compiled
env (the fast-path flagship config; BASELINE config 4), single device.
CLI: ``<env> ppo-mlp --compiled --mxu --table-net --fused-kernel``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from ..agents.ppo import PPOAgent
from ..envs.compiled import TableState
from ..envs.mxu import MXUState, MXUVecEnv
from ..ops.dqn_kernel import build_payload, pick_lane_block
from ..ops.ppo_collect_kernel import TB_P, ppo_collect_run
from ..ops.ppo_kernel import ppo_optimize_run
from ..ops.ppo_stoch_collect_kernel import ppo_stoch_collect_run
from ..ops.rollout_kernel import _round_up
from .common import ChunkStats
from .ppo_mxu import MXUCRMDPTrainer, MXUPPOTrainer


class PallasPPOTrainer(MXUPPOTrainer):
    SUB = 1024  # minibatch lanes streamed per kernel grid step

    def __init__(self, agent: PPOAgent, mxu: MXUVecEnv, cheat: bool = False,
                 unroll: int = 4):
        assert getattr(agent, "_table_net", False), (
            "--fused-kernel ppo needs --table-net (the kernel folds the obs "
            "table into layer 1)"
        )
        assert len(agent.hidden) == 2, (
            f"the fused optimize kernel covers 2-hidden-layer nets, got "
            f"{agent.hidden}"
        )
        super().__init__(agent, mxu, cheat=cheat, mode="fast", unroll=unroll)
        env = agent.env
        self.S = int(env.num_states)
        self.A = int(env.n_actions)
        assert self.A + 1 <= 8, "head tensor packs logits+value into 8 rows"
        self.A_pad = 8
        self.H1, self.H2 = agent.hidden
        obs_flat = np.asarray(env.obs_table, np.float32).reshape(self.S, -1)
        self.D = obs_flat.shape[1]
        self.S_pad = _round_up(self.S, 64)
        self.D_pad = _round_up(self.D, 128)
        O2 = np.zeros((self.D_pad, self.S_pad), np.float32)
        O2[: self.D, : self.S] = obs_flat.T
        self._O2 = jnp.asarray(O2)
        # Fused COLLECT (round 5, ops/ppo_collect_kernel.py): frozen-params
        # policy tables + inverse-CDF sampling in-kernel. Stochastic envs
        # ride the stochastic variant (round-5 closing,
        # ops/ppo_stoch_collect_kernel.py — coin/carried resets, whisky
        # noise, tomato drying), so BOTH phases run in kernels on every
        # compiled alias.
        self._fused_collect = True  # tests flip this to isolate optimize
        self._stoch_collect = bool(mxu._stochastic)
        nb = pick_lane_block(self.S_pad, mxu.n_envs)
        if self._stoch_collect:
            from ..ops.stoch_rollout_kernel import PallasStochRolloutEngine

            seng = PallasStochRolloutEngine(mxu.cenv, mxu.n_envs)
            self._seng = seng
            # The stoch engine's payload, f32 (bf16→f32 is exact) — the
            # policy rows are arbitrary floats so the dot is f32 HIGHEST.
            self._env_payload = jnp.asarray(seng._w, jnp.float32)
            self._cstatic = (
                self.S_pad, self.A, seng.F, mxu.max_steps, seng._mode,
                int(seng._r0), int(seng._r1), seng._noise,
                seng._dry_nbits, nb,
            )
        else:
            self._env_payload = jnp.asarray(build_payload(mxu), jnp.float32)
            self._cstatic = (
                self.S_pad, self.A, mxu.max_steps, mxu.reset_idx, nb
            )
        self._all_states = TableState(
            idx=jnp.arange(self.S, dtype=jnp.int32),
            t=jnp.zeros((self.S,), jnp.int32),
        )

    # -- fused collect (overrides the XLA scan; own uniform-draw protocol) --
    def _collect_payload(self, params):
        """Env payload + frozen-params policy rows (logp, inverse-CDF
        thresholds, value) — the whole actor evaluated once per chunk."""
        logits, value = self.agent.policy_value(params, self._all_states)
        logp = jax.nn.log_softmax(logits)                   # [S, A]
        cdf = jnp.cumsum(jax.nn.softmax(logits), -1)[:, :-1]  # [S, A-1]
        rows = jnp.concatenate(
            [logp.T, cdf.T, value[None, :]], axis=0
        )                                                   # [2A, S]
        pad = jnp.zeros((2 * self.A, self.S_pad), jnp.float32)
        rows = pad.at[:, : self.S].set(rows)
        return jnp.concatenate([self._env_payload, rows], axis=0)

    def collect(self, astate, mstate, key, n_steps: int):
        if not self._fused_collect:
            return super().collect(astate, mstate, key, n_steps)
        if n_steps % TB_P:
            raise ValueError(
                f"--chunk-steps {n_steps} must be a multiple of {TB_P} for "
                "--fused-kernel ppo"
            )
        n = self.vec.n_envs
        state = (
            mstate.idx[None, :], mstate.t[None, :],
            mstate.ep_return[None, :], mstate.ep_hidden[None, :],
            mstate.ep_len[None, :],
        )
        if self._stoch_collect:
            # Four-way bulk draw (ppo_stoch_collect_kernel module doc).
            ks = jax.random.split(key, 5)
            k_out = ks[4]
            u = jax.random.uniform(ks[0], (n_steps, n), jnp.float32)
            bits = self._seng.draw_bits(ks[1], n_steps, n)
            stumble = jax.random.bernoulli(
                ks[2], self._seng._p_noise, (n_steps, n)
            ).astype(jnp.int32)
            rand_a = jax.random.randint(ks[3], (n_steps, n), 0, self.A)
            outs = ppo_stoch_collect_run(
                self._cstatic, self._collect_payload(astate.params), state,
                u, bits, stumble, rand_a,
            )
        else:
            k_u, k_out = jax.random.split(key)
            u = jax.random.uniform(k_u, (n_steps, n), jnp.float32)
            outs = ppo_collect_run(
                self._cstatic, self._collect_payload(astate.params), state, u
            )
        (idx, t, epr, eph, epl, eacc, racc, hacc, lacc,
         pidx, pt, act, logp, val, rew, hid, done, nidx) = outs
        traj = {
            "states": TableState(idx=pidx, t=pt),
            "actions": act,
            "old_logp": logp,
            "values": val,
            "rewards": hid if self.cheat else rew,
            "observed": rew,
            "hidden": hid,
            "dones": done.astype(bool),
            "next_idx": nidx,
        }
        mstate = MXUState(
            idx=idx[0], t=t[0], ep_return=epr[0], ep_hidden=eph[0],
            ep_len=epl[0], key=mstate.key,
        )
        stats = ChunkStats(
            episodes=eacc.sum(),
            return_sum=racc.sum(),
            hidden_sum=hacc.sum(),
            length_sum=lacc.sum(),
            env_steps=jnp.float32(n_steps * n),
        )
        return mstate, k_out, stats, traj

    # -- params/opt_state ↔ kernel tensor tuples ---------------------------
    def _to_tensors(self, tree):
        p = tree["params"]
        H1, H2, A, A_pad = self.H1, self.H2, self.A, self.A_pad
        w1T = jnp.zeros((H1, self.D_pad), jnp.float32)
        w1T = w1T.at[:, : self.D].set(p["w1"].T)
        b1 = p["b1"].reshape(H1, 1)
        W2T = p["Dense_0"]["kernel"].T
        b2 = p["Dense_0"]["bias"].reshape(H2, 1)
        H3T = jnp.zeros((A_pad, H2), jnp.float32)
        H3T = H3T.at[:A].set(p["Dense_1"]["kernel"].T)
        H3T = H3T.at[A].set(p["Dense_2"]["kernel"][:, 0])
        b3 = jnp.zeros((A_pad, 1), jnp.float32)
        b3 = b3.at[:A, 0].set(p["Dense_1"]["bias"])
        b3 = b3.at[A, 0].set(p["Dense_2"]["bias"][0])
        return (w1T, b1, W2T, b2, H3T, b3)

    def _from_tensors(self, t):
        w1T, b1, W2T, b2, H3T, b3 = t
        A = self.A
        return {"params": {
            "w1": w1T[:, : self.D].T,
            "b1": b1[:, 0],
            "Dense_0": {"kernel": W2T.T, "bias": b2[:, 0]},
            "Dense_1": {"kernel": H3T[:A].T, "bias": b3[:A, 0]},
            "Dense_2": {"kernel": H3T[A : A + 1].T, "bias": b3[A : A + 1, 0]},
        }}

    # -- fused optimize (overrides the XLA fast path; same membership) -----
    def optimize_fast(self, astate, flat, key, batch_size: int,
                      axis_name: str | None = None, entropy_coef=None):
        assert axis_name is None, (
            "--fused-kernel is single-device; drop --n-devices"
        )
        agent = self.agent
        n_mb = agent.n_minibatches
        mb_size = batch_size // n_mb
        tile = self.TILE
        while mb_size % tile:
            tile //= 2
        used = n_mb * mb_size
        n_tiles = used // tile
        sub = self.SUB
        # Adaptive sub-block (the dqn_update_kernel guard): ~3 [S_pad, sub]
        # f32 one-hot operands live per step — keep them ≤ ~2.5 MB so the
        # kernel's total (params ×3 sets, folds, O2, temporaries) stays
        # inside the 16 MB scoped-VMEM limit (tomato-crmdp's S_pad=1344 at
        # sub=1024 measured 31.55 M scoped — OOM by 15.55 M).
        while sub > 128 and 3 * self.S_pad * sub * 4 > 2_500_000:
            sub //= 2
        while mb_size % sub:
            sub //= 2
        n_sub = mb_size // sub
        n_upd = agent.epochs * n_mb

        # Epoch-stacked permuted flats: the SAME fold_in(key, e) tile
        # permutations as the XLA fast optimize, pre-applied so the kernel
        # streams contiguous sub-blocks.
        n_rows = n_upd * n_sub
        n_rows_pad = -(-n_rows // 8) * 8  # Mosaic: 8-row stream blocks

        def stack(x):
            xt = x[:used].reshape(n_tiles, tile)
            eps = []
            for e in range(agent.epochs):
                perm = jax.random.permutation(
                    jax.random.fold_in(key, e), n_tiles
                )
                eps.append(xt[perm].reshape(used))
            rows = jnp.stack(eps).reshape(n_rows, sub)
            if n_rows_pad != n_rows:
                rows = jnp.pad(rows, ((0, n_rows_pad - n_rows), (0, 0)))
            return rows

        streams = (
            stack(flat["states"].idx).astype(jnp.int32),
            stack(flat["actions"]).astype(jnp.int32),
            stack(flat["old_logp"]),
            stack(flat["advantages"]),
            stack(flat["returns"]),
        )

        adam_state = astate.opt_state[1][0]  # (clip, (scale_by_adam, scale))
        tensors = self._to_tensors(astate.params)
        mu = self._to_tensors(self._unravel(adam_state.mu))
        nu = self._to_tensors(self._unravel(adam_state.nu))
        ce = (
            jnp.float32(agent.entropy_bonus)
            if entropy_coef is None else entropy_coef
        ).reshape(1, 1)
        static = (
            self.S_pad, self.D_pad, self.A, self.A_pad, self.H1, self.H2,
            n_sub, n_upd, float(mb_size), sub,
            float(agent.lr), float(agent.clipping), float(agent.value_coef),
            float(agent.max_grad_norm), 0.9, 0.999, 1e-8,
        )
        t_out, mu_out, nu_out, count, loss = ppo_optimize_run(
            static, tensors, mu, nu,
            adam_state.count.astype(jnp.int32).reshape(1, 1), ce, self._O2,
            streams,
        )
        params = self._from_tensors(t_out)
        new_adam = adam_state._replace(
            count=count.reshape(()),
            mu=ravel_pytree(self._from_tensors(mu_out))[0],
            nu=ravel_pytree(self._from_tensors(nu_out))[0],
        )
        opt_state = (
            astate.opt_state[0],
            (new_adam,) + tuple(astate.opt_state[1][1:]),
        )
        return params, opt_state, loss.reshape(())


class PallasCRMDPTrainer(PallasPPOTrainer, MXUCRMDPTrainer):
    """PPO-CRMDP with BOTH phases in kernels (round-5 closing): the fused
    collect (deterministic or stochastic variant) and the fused optimize
    come from :class:`PallasPPOTrainer`; the corruption-attribution NLMS
    update, reward relabel, and GAE run between the kernels exactly as in
    :class:`~.ppo_mxu.MXUCRMDPTrainer` (whose ``train_chunk`` this class
    inherits through the MRO — it calls ``self.collect`` /
    ``self.optimize_fast``, which resolve to the kernel paths). The
    attribution consumes the kernel records' ``next_idx``/``observed``/
    ``hidden`` fields, which both collect kernels emit.

    CLI: ``<env> ppo-crmdp --compiled --mxu --table-net --fused-kernel``.
    """

    def __init__(self, agent, mxu: MXUVecEnv, unroll: int = 4):
        # MRO: PallasPPOTrainer.__init__ → MXUCRMDPTrainer.__init__
        # (cheat pass-through asserts False) → MXUPPOTrainer.__init__.
        super().__init__(agent, mxu, cheat=False, unroll=unroll)
