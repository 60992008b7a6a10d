"""DQN over the MXU fused rollout engine.

Same fused chunk as ``DQNTrainer`` (collect T steps → push → U sampled
updates) with the collect phase riding the matmul engine instead of the
gather pipeline (PERF.md: ~1.4 B vs ~32 M steps/s bare). Replay records are
``TableState`` pytrees (a state index + step counter — a few bytes per
transition); observations re-render at sample time through the compiled
env's obs-table gather, so the agent (``DQNAgent``) is unchanged: both its
MLP and table-net paths consume ``TableState`` batches natively.

Round 4 (VERDICT r3 next #3 — the PPO treatment). Both phases were
kernel-boundary-latency-bound, not FLOP-bound (tools/diag.py dqn-decomp);
three bitwise-preserving layout changes lift the measured rate:

* the update scan runs on ``ravel_pytree``-flattened params/target params
  (one fused elementwise adam + one flat target-sync select instead of ~8
  small kernels per leaf) — the SAME math as ``DQNAgent.update`` bit for
  bit (adam and the sync select are elementwise, so flattening does not
  even reassociate floats; tests/test_mxu.py pins the equality);
* the collect phase stacks its transitions and issues ONE time-major
  [T·N] ring write instead of T per-step pushes — identical buffer
  content by ``replay._ring_positions``'s position contract (also for
  PER), in T× fewer scatter kernels, with the ring out of the scan carry;
* both scans are unrolled (``unroll=4``).

n-step returns (round 4, VERDICT r3 missing #4 closed): the batched-push
collect already stacks the chunk trajectory, so the n-step window pass is
the SAME ``push_traj_windows`` the base trainer uses — ``--n-step`` now
works under ``--mxu`` with identical window semantics (and with n_step=1
the pushed stream stays bitwise-identical to per-step pushes). CLI:
``--mxu`` with deep-q.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..agents.dqn import DQNAgent, DQNState, Transition
from ..envs.compiled import TableState
from ..envs.mxu import MXUState, MXUVecEnv
from ..utils import replay
from .common import ChunkStats
from .tabular_mxu import _accumulate


class MXUDQNTrainer:
    def __init__(
        self,
        agent: DQNAgent,
        mxu: MXUVecEnv,
        cheat: bool = False,
        updates_per_chunk: int | None = None,
        unroll: int = 4,
    ):
        self.agent = agent
        self.vec = mxu
        self.cheat = cheat
        self.updates_per_chunk = updates_per_chunk
        self.unroll = unroll
        # Unravel closure for the flat-param update scan (static pytree
        # shape). Params-only init: DQNAgent.init would also allocate the
        # full replay ring just to be discarded here.
        p0 = agent.init_params(jax.random.PRNGKey(0))
        self._flat0, self._unravel = ravel_pytree(p0)

    def init(self, key) -> Tuple[DQNState, MXUState]:
        ka, kv = jax.random.split(key)
        astate = self.agent.init(ka)
        # The optimizer state lives flat (adam moments are elementwise, so
        # this is the identical math in fewer kernels — module docstring).
        astate = astate.replace(
            opt_state=self.agent.tx.init(ravel_pytree(astate.params)[0])
        )
        return astate, self.vec.reset(kv)

    def _collect(self, astate, mstate, key, n_steps: int, random_policy: bool):
        """Collect T steps with ONE batched replay write at the end.

        Per-step pushes cost ~7 scatter kernels per leaf per iteration and
        thread the whole ring through the scan carry; stacking the chunk's
        transitions and pushing a single time-major [T·N] batch is
        bitwise-identical buffer content (``replay._ring_positions``:
        transition t lands at (idx + t) % cap, and PER entries land at the
        unchanged max priority) in T× fewer scatters. The ε-anneal step
        counter still advances inside the scan, so exploration draws match
        the per-step push path exactly (tests/test_mxu.py pins both)."""
        agent = self.agent
        n_local = mstate.idx.shape[0]

        def body(carry, _):
            astate, st, k, stats = carry
            k, ka = jax.random.split(k)
            pre = TableState(idx=st.idx, t=st.t)
            if random_policy:
                actions = jax.random.randint(
                    ka, (n_local,), 0, self.vec.A
                )
            else:
                actions = agent.act_explore(astate, pre, ka)
            st, out = self.vec.step(st, actions)
            astate = astate.replace(step=astate.step + n_local)
            # On done steps st.t is the post-reset 0; store the terminal t+1
            # the VecEnv path records via pre_reset_env (done masks the
            # bootstrap today, but keep the record faithful for any future
            # unmasked reader — n-step windows, obs statistics).
            nxt = TableState(
                idx=out["next_idx"],
                t=jnp.where(out["done"], pre.t + 1, st.t),
            )
            tr = Transition(
                state=pre,
                action=actions,
                reward=out["hidden_reward"] if self.cheat else out["reward"],
                next_state=nxt,
                done=out["done"],
            )
            return (astate, st, k, _accumulate(stats, out)), tr

        (astate, mstate, key, stats), traj = jax.lax.scan(
            body, (astate, mstate, key, ChunkStats.zero()), None,
            length=n_steps, unroll=self.unroll,
        )
        # Shared n-step window pass (training/dqn.py). n_step == 1 reduces
        # to the plain time-major [T·N] flatten + one ring write.
        from .dqn import push_traj_windows

        astate = astate.replace(
            buffer=push_traj_windows(
                agent, astate.buffer,
                (traj.state, traj.action, traj.reward, traj.next_state,
                 traj.done),
            )
        )
        return astate, mstate, key, stats

    def warmup_chunk(self, astate, mstate, key, n_steps: int):
        astate, mstate, _, stats = self._collect(
            astate, mstate, key, n_steps, random_policy=True
        )
        return astate, mstate, stats

    def _update_scan(self, astate: DQNState, key, n_updates: int,
                     axis_name: str | None = None):
        """U sampled updates on flat params — ``DQNAgent.update`` mirrored
        bit for bit (same key splits, same sample draws, same TD loss;
        adam + target sync flattened, which is elementwise-identical)."""
        agent = self.agent
        unravel = self._unravel
        flat_p = ravel_pytree(astate.params)[0]
        flat_t = ravel_pytree(astate.target_params)[0]

        def upd(carry, _):
            p, tp, opt_state, buffer, n_upd, k = carry
            k, ku = jax.random.split(k)
            if agent.prioritized:
                batch, idxs, weights = replay.sample_prioritized(
                    buffer, ku, agent.batch_size, agent.per_alpha,
                    agent.current_beta(astate.step),
                )

                def loss_fn(fp):
                    losses, td = agent.td_components(
                        unravel(fp), unravel(tp), batch
                    )
                    return (weights * losses).mean(), td

                (loss, td), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
                buffer = replay.update_priorities(
                    buffer, idxs, td, eps=agent.per_eps, clip=agent.per_clip
                )
            else:
                batch = replay.sample(buffer, ku, agent.batch_size)
                loss, g = jax.value_and_grad(
                    lambda fp: agent.td_loss(unravel(fp), unravel(tp), batch)
                )(p)
            if axis_name is not None:
                g = jax.lax.pmean(g, axis_name)
                loss = jax.lax.pmean(loss, axis_name)
            updates, opt_state = agent.tx.update(g, opt_state, p)
            p = p + updates
            n_upd = n_upd + 1
            sync = (n_upd % agent.sync_every) == 0
            tp = jnp.where(sync, p, tp)
            return (p, tp, opt_state, buffer, n_upd, k), loss

        (flat_p, flat_t, opt_state, buffer, n_upd, _), losses = jax.lax.scan(
            upd,
            (flat_p, flat_t, astate.opt_state, astate.buffer,
             astate.updates, key),
            None, length=n_updates, unroll=self.unroll,
        )
        astate = DQNState(
            params=unravel(flat_p),
            target_params=unravel(flat_t),
            opt_state=opt_state,
            buffer=buffer,
            step=astate.step,
            updates=n_upd,
        )
        return astate, losses.mean()

    def train_chunk(
        self, astate, mstate, key, n_steps: int, axis_name: str | None = None
    ):
        astate, mstate, key, stats = self._collect(
            astate, mstate, key, n_steps, random_policy=False
        )
        n_updates = self.updates_per_chunk or n_steps
        astate, loss = self._update_scan(
            astate, key, n_updates, axis_name=axis_name
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
