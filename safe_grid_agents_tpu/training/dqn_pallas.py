"""DQN with the collect phase fused into a single pallas kernel per chunk.

Counterpart of :class:`~.dqn_mxu.MXUDQNTrainer` with the T-step collect
loop (ε-greedy act → env step → record) inside ONE kernel
(`ops/dqn_kernel.py`) — deleting the ~28 ms/chunk per-step kernel-launch
floor that PERF.md's round-4 decomposition pins as the trainer's roof
(~37 M steps/s asymptote) — and, when eligible, the sampled-update scan
inside a SECOND kernel (`ops/dqn_update_kernel.py`: params + target +
Adam VMEM-resident, in-kernel scheduled target sync; allclose vs an XLA
twin on identical batches). Eligibility for the fused update: uniform
replay with a 2-hidden-layer net — PER keeps ``MXUDQNTrainer``'s XLA
update scan (priorities feed back into sampling), and n-step windows /
double-Q work in both paths. The ring write between the phases stays the
inherited one-roll push, so replay semantics are unchanged.

In-kernel acting needs no MLP — and no Q values at all: during a collect
chunk the params are frozen, and a compiled env's Q is a pure function of
the state index (`agents/dqn.py::q_values` — both the MLP and table-net
paths), so the whole network evaluates once per chunk into ``Q_all =
q_values(params, arange(S))`` whose argmax bakes into a greedy-action
payload row (kernel module doc). Works for BOTH ``--table-net`` and the
plain MLP.

RNG protocol: this trainer's OWN documented bulk-draw contract (see the
kernel module docstring) — two presampled [T, N] threefry draws per chunk,
NOT the MXU trainer's per-step split chain; trajectories are therefore not
bitwise with ``MXUDQNTrainer``. Gates: host-replay equivalence
(tests/test_dqn_kernel.py) + the sokoban learning optimum through the CLI.

Scope: every compiled alias — deterministic-reset envs (sokoban =
BASELINE config 3) through `ops/dqn_kernel.py`, stochastic envs
(absent / interrupt / whisky / friend family / tomato's drying) through
`ops/dqn_stoch_kernel.py`. Single device.
CLI: ``<env> deep-q --compiled --mxu --fused-kernel``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.dqn import DQNAgent
from ..envs.compiled import TableState
from ..envs.mxu import MXUState, MXUVecEnv
from ..ops.dqn_kernel import (
    TB_REC, build_payload, dqn_collect_run, pick_lane_block,
)
from ..ops.dqn_stoch_kernel import dqn_stoch_collect_run
from ..ops.dqn_update_kernel import dqn_update_run
from ..ops.rollout_kernel import _round_up
from .common import ChunkStats
from .dqn import push_traj_windows
from .dqn_mxu import MXUDQNTrainer


class PallasDQNTrainer(MXUDQNTrainer):
    """MXUDQNTrainer with the collect phase replaced by the fused kernel
    (single-device; DP runs keep ``--mxu`` without ``--fused-kernel``)."""

    def __init__(self, agent: DQNAgent, mxu: MXUVecEnv, cheat: bool = False,
                 updates_per_chunk: int | None = None, unroll: int = 4):
        super().__init__(
            agent, mxu, cheat=cheat, updates_per_chunk=updates_per_chunk,
            unroll=unroll,
        )
        self.S, self.A = mxu.S, mxu.A
        self.S_pad = _round_up(self.S, 64)
        nb = pick_lane_block(self.S_pad, mxu.n_envs)
        if mxu.n_envs % nb:
            raise ValueError(
                f"{mxu.cenv.name}: --n-envs {mxu.n_envs} is not a multiple "
                f"of the kernel lane block {nb}"
            )
        anneal = float(max(agent.epsilon_anneal_steps, 1))
        eps = (float(agent.epsilon), float(agent.epsilon_final), anneal)
        self._stochastic = bool(mxu._stochastic)
        if self._stochastic:
            # Stochastic collect (round 5, ops/dqn_stoch_kernel.py): the
            # stoch rollout engine supplies payload/mode analysis; the
            # greedy row is appended per chunk like the deterministic path.
            from ..ops.stoch_rollout_kernel import PallasStochRolloutEngine

            seng = PallasStochRolloutEngine(mxu.cenv, mxu.n_envs)
            self._seng = seng
            self._w_static = seng._w
            self._dtype = seng._w.dtype
            base = (
                self.S_pad, self.A, seng.F, mxu.max_steps, seng._mode,
                int(seng._r0), int(seng._r1), seng._noise,
                seng._dry_nbits, nb,
            )
        else:
            # hi/lo-split payload (kernel module doc): bf16 when the
            # reward/hidden columns are bf16-exact (hi/lo/done/greedy
            # always are) — the dots stay bitwise either way, bf16 just
            # runs ~6× fewer MXU passes per step than f32 HIGHEST.
            W = build_payload(mxu)                    # [A*F_K, S_pad] f32
            if np.array_equal(
                W.astype(jnp.bfloat16).astype(np.float32), W
            ):
                self._dtype = jnp.bfloat16
            else:
                self._dtype = jnp.float32
            self._w_static = jnp.asarray(W, self._dtype)
            base = (self.S_pad, self.A, mxu.max_steps, mxu.reset_idx, nb)
        self._static = base + eps + (bool(cheat),)
        # Warmup = the same kernel with ε pinned to 1.0: u ∈ [0, 1) < 1
        # always, so every action is the presampled uniform draw.
        self._static_warm = base + (1.0, 1.0, anneal, bool(cheat))
        # All-states probe for the frozen-params Q table (t is irrelevant:
        # compiled observations depend on idx only).
        self._all_states = TableState(
            idx=jnp.arange(self.S, dtype=jnp.int32),
            t=jnp.zeros((self.S,), jnp.int32),
        )
        # Fused UPDATE eligibility (round 5, ops/dqn_update_kernel.py):
        # uniform replay only (PER's priorities mutate between updates —
        # genuinely sequential; pinned to the XLA path), two hidden layers.
        self._fused_update = (
            not agent.prioritized and len(agent.hidden) == 2
            and agent.env.n_actions <= 8
        )
        if self._fused_update:
            obs_flat = np.asarray(
                agent.env.obs_table, np.float32
            ).reshape(self.S, -1)
            self.D = obs_flat.shape[1]
            self.D_pad = _round_up(self.D, 128)
            self.A_pad = 8
            self.H1, self.H2 = agent.hidden
            O2 = np.zeros((self.D_pad, self.S_pad), np.float32)
            O2[: self.D, : self.S] = obs_flat.T
            self._O2 = jnp.asarray(O2)

    # -- fused update (ops/dqn_update_kernel.py) ---------------------------
    SUB_U = 512

    def _qparams_to_tensors(self, tree):
        """Params pytree → the kernel's 6-tensor tuple. Layer names differ
        between the table net (w1/b1 + Dense_0 + Dense_1) and the plain
        QMLP (Dense_0/1/2); both fold to the same shapes."""
        p = tree["params"]
        if self.agent._table_net:
            w1, b1v = p["w1"], p["b1"]
            W2, b2v = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
            W3, b3v = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
        else:
            w1, b1v = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
            W2, b2v = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
            W3, b3v = p["Dense_2"]["kernel"], p["Dense_2"]["bias"]
        H1, H2, A, A_pad = self.H1, self.H2, self.A, self.A_pad
        w1T = jnp.zeros((H1, self.D_pad), jnp.float32)
        w1T = w1T.at[:, : self.D].set(w1.T)
        H3T = jnp.zeros((A_pad, H2), jnp.float32).at[:A].set(W3.T)
        b3 = jnp.zeros((A_pad, 1), jnp.float32).at[:A, 0].set(b3v)
        return (w1T, b1v.reshape(H1, 1), W2.T, b2v.reshape(H2, 1), H3T, b3)

    def _tensors_to_qparams(self, t):
        w1T, b1, W2T, b2, H3T, b3 = t
        A = self.A
        w1 = w1T[:, : self.D].T
        if self.agent._table_net:
            return {"params": {
                "w1": w1, "b1": b1[:, 0],
                "Dense_0": {"kernel": W2T.T, "bias": b2[:, 0]},
                "Dense_1": {"kernel": H3T[:A].T, "bias": b3[:A, 0]},
            }}
        return {"params": {
            "Dense_0": {"kernel": w1, "bias": b1[:, 0]},
            "Dense_1": {"kernel": W2T.T, "bias": b2[:, 0]},
            "Dense_2": {"kernel": H3T[:A].T, "bias": b3[:A, 0]},
        }}

    def _update_scan(self, astate, key, n_updates: int,
                     axis_name: str | None = None):
        if axis_name is not None or not self._fused_update:
            return super()._update_scan(
                astate, key, n_updates, axis_name=axis_name
            )
        from jax.flatten_util import ravel_pytree

        agent = self.agent
        B = agent.batch_size
        sub = min(self.SUB_U, B)
        # Adaptive sub-block: ~3 [S_pad, sub] f32 one-hot operands live per
        # step (state + next + matmul residency) — keep them ≤ ~2.5 MB so
        # the kernel's total (params ×4 sets, folds, O2, temporaries) stays
        # inside the 16 MB scoped-VMEM limit (sokoban at sub=512 measured
        # OOM by 4.2 MB).
        while sub > 128 and 3 * self.S_pad * sub * 4 > 2_500_000:
            sub //= 2
        while B % sub:
            sub //= 2
        n_sub = B // sub
        G = n_updates * n_sub
        G8 = -(-G // 8) * 8
        # Own sample protocol (module doc): ONE randint over the post-push
        # ring (constant across the chunk's updates for uniform replay).
        idxs = jax.random.randint(
            key, (n_updates, B), 0, astate.buffer.size
        )
        batch = jax.tree.map(lambda s: s[idxs], astate.buffer.storage)

        def sh(x, dtype):
            x = x.reshape(G, sub).astype(dtype)
            if G8 != G:
                x = jnp.pad(x, ((0, G8 - G), (0, 0)))
            return x

        streams = (
            sh(batch.state.idx, jnp.int32),
            sh(batch.next_state.idx, jnp.int32),
            sh(batch.action, jnp.int32),
            sh(batch.reward, jnp.float32),
            sh(batch.done, jnp.int32),
        )
        adam = astate.opt_state[0]
        static = (
            self.S_pad, self.D_pad, self.A, self.A_pad, self.H1, self.H2,
            n_sub, n_updates, float(B), sub,
            float(agent.lr), float(agent.discount ** agent.n_step),
            int(agent.sync_every), bool(agent.double_q), 0.9, 0.999, 1e-8,
        )
        t_out, tt_out, mu_out, nu_out, count, nupd, loss = dqn_update_run(
            static,
            self._qparams_to_tensors(astate.params),
            self._qparams_to_tensors(astate.target_params),
            self._qparams_to_tensors(self._unravel(adam.mu)),
            self._qparams_to_tensors(self._unravel(adam.nu)),
            adam.count.astype(jnp.int32).reshape(1, 1),
            astate.updates.astype(jnp.int32).reshape(1, 1),
            self._O2, streams,
        )
        new_adam = adam._replace(
            count=count.reshape(()),
            mu=ravel_pytree(self._tensors_to_qparams(mu_out))[0],
            nu=ravel_pytree(self._tensors_to_qparams(nu_out))[0],
        )
        astate = astate.replace(
            params=self._tensors_to_qparams(t_out),
            target_params=self._tensors_to_qparams(tt_out),
            opt_state=(new_adam,) + tuple(astate.opt_state[1:]),
            updates=nupd.reshape(()),
        )
        return astate, loss.reshape(())

    def _payload(self, params):
        """Static payload + the frozen-params greedy row (first-max argmax
        over the once-per-chunk network evaluation; ≤ A so always exact)."""
        q_all = self.agent.q_values(params, self._all_states)   # [S, A]
        g = jnp.argmax(q_all, axis=-1).astype(self._dtype)      # [S]
        row = jnp.zeros((1, self.S_pad), self._dtype).at[0, : self.S].set(g)
        return jnp.concatenate([self._w_static, row], axis=0)

    def _collect(self, astate, mstate, key, n_steps: int,
                 random_policy: bool):
        if n_steps % TB_REC:
            raise ValueError(
                f"--chunk-steps {n_steps} must be a multiple of {TB_REC} "
                "for --fused-kernel deep-q"
            )
        n = self.vec.n_envs
        state = (
            mstate.idx[None, :], mstate.t[None, :],
            mstate.ep_return[None, :], mstate.ep_hidden[None, :],
            mstate.ep_len[None, :],
        )
        static = self._static_warm if random_policy else self._static
        if self._stochastic:
            # Five-way bulk draw + output key (dqn_stoch_kernel doc).
            ks = jax.random.split(key, 6)
            k_out = ks[5]
            rand_a = jax.random.randint(ks[0], (n_steps, n), 0, self.A)
            u = jax.random.uniform(ks[1], (n_steps, n), jnp.float32)
            bits = self._seng.draw_bits(ks[2], n_steps, n)
            stumble = jax.random.bernoulli(
                ks[3], self._seng._p_noise, (n_steps, n)
            ).astype(jnp.int32)
            rand2 = jax.random.randint(ks[4], (n_steps, n), 0, self.A)
            outs = dqn_stoch_collect_run(
                static, self._payload(astate.params), state,
                astate.step.reshape(1, 1), rand_a, u, bits, stumble, rand2,
            )
        else:
            k_a, k_u, k_out = jax.random.split(key, 3)
            rand_a = jax.random.randint(k_a, (n_steps, n), 0, self.A)
            u = jax.random.uniform(k_u, (n_steps, n), jnp.float32)
            outs = dqn_collect_run(
                static, self._payload(astate.params), state,
                astate.step.reshape(1, 1), rand_a, u,
            )
        (idx, t, epr, eph, epl, step, eacc, racc, hacc, lacc,
         pidx, pt, act, rew, nidx, done) = outs
        astate = astate.replace(step=step.reshape(()))
        # next_t: the MXU record stores where(done, pre.t+1, post.t) and the
        # post-step t is pre.t+1 whenever not done — so it is pre.t+1 in
        # both branches (bitwise-identical to dqn_mxu's stored record).
        done_b = done.astype(bool)
        traj = (
            TableState(idx=pidx, t=pt),
            act,
            rew,
            TableState(idx=nidx, t=pt + 1),
            done_b,
        )
        astate = astate.replace(
            buffer=push_traj_windows(self.agent, astate.buffer, traj)
        )
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
        return astate, mstate, k_out, stats
