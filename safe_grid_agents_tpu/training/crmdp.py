"""Fused PPO-CRMDP trainer (reference SURVEY.md §3.2: CRMDP inserts a
reward-relabel pass between collect and update)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..agents.crmdp import CRMDPState, PPOCRMDPAgent
from ..envs.vec import VecEnv, VecState
from .common import ChunkStats
from .ppo import PPOTrainer, _whiten, compute_gae


class CRMDPTrainer(PPOTrainer):
    def __init__(self, agent: PPOCRMDPAgent, vec: VecEnv):
        # CRMDP trains on observed rewards (relabeled) — cheat is meaningless.
        super().__init__(agent, vec, cheat=False)
        self._v_index = jax.vmap(vec.env.state_index)

    def train_chunk(
        self,
        astate: CRMDPState,
        vstate: VecState,
        key,
        n_steps: int,
        axis_name: str | None = None,
    ) -> Tuple[CRMDPState, VecState, ChunkStats, jnp.ndarray]:
        agent: PPOCRMDPAgent = self.agent
        vstate, key, stats, traj = self.collect(astate, vstate, key, n_steps)

        # Arrival-state indices are recorded during collect (pre-reset
        # successors — shifting the stored pre-step states would be wrong
        # across auto-reset boundaries).
        next_idx = traj["next_idx"]

        corruption = agent.update_corruption(
            astate.corruption,
            next_idx,
            traj["observed"],
            traj["hidden"],
            axis_name=axis_name,
        )
        relabeled = agent.relabel(corruption, traj["rewards"], next_idx)

        _, last_value = agent.policy_value(astate.params, vstate.env)
        advantages, returns = compute_gae(
            relabeled,
            traj["values"],
            traj["dones"],
            last_value,
            agent.discount,
            agent.gae_lambda,
        )
        advantages = _whiten(advantages, axis_name)

        # Per-shard batch: under shard_map the local env count is N/D.
        batch_size = n_steps * traj["actions"].shape[1]
        flat = {
            "states": jax.tree.map(
                lambda x: x.reshape((batch_size,) + x.shape[2:]), traj["states"]
            ),
            "actions": traj["actions"].reshape(batch_size),
            "old_logp": traj["old_logp"].reshape(batch_size),
            "advantages": advantages.reshape(batch_size),
            "returns": returns.reshape(batch_size),
        }
        key, ko = jax.random.split(key)
        params, opt_state, loss = self.optimize(
            astate, flat, ko, batch_size, axis_name=axis_name,
            entropy_coef=agent.entropy_coef(astate.step),
        )
        astate = CRMDPState(
            params=params,
            opt_state=opt_state,
            step=astate.step + batch_size,
            corruption=corruption,
        )
        return astate, vstate, stats, loss

    # Extend collect to also record arrival-state indices.
    def collect(self, astate, vstate, key, n_steps):
        agent = self.agent

        def body(carry, _):
            vs, k, stats = carry
            k, ka = jax.random.split(k)
            action, logp, value = agent.sample_action(astate.params, vs.env, ka)
            pre_env = vs.env
            vs, out = self.vec.step(vs, action)
            step_data = {
                "states": pre_env,
                "actions": action,
                "old_logp": logp,
                "values": value,
                "rewards": out.reward,
                "observed": out.reward,
                "hidden": out.hidden_reward,
                "dones": out.done,
                "next_idx": self._v_index(out.pre_reset_env),
            }
            return (vs, k, stats.accumulate(out)), step_data

        (vstate, key, stats), traj = jax.lax.scan(
            body, (vstate, key, ChunkStats.zero()), None, length=n_steps
        )
        return vstate, key, stats, traj
