"""PPO-CRMDP — PPO for corrupt-reward MDPs (reference ppo/agents/crmdp.py,
SURVEY.md §2a #10, Everitt et al. 2017 arXiv:1705.08417).

Reference behavior [M on exact rule]: track per-state observed-vs-true
discrepancies using the end-of-episode hidden performance signal, and
override rewards for states judged corrupt before the PPO update.

Canonical rule implemented here (documented, since the reference mount was
empty — SURVEY.md §0): **online least-squares corruption attribution.** The
agent never sees per-step hidden rewards; after each rollout chunk it
receives only the *aggregate* discrepancy per env instance

    resid_i = Σ_t observed_r(i,t) − Σ_t hidden_r(i,t)

(the CRMDP "delayed performance feedback"). With visit counts n_is of state
s by env i, the per-state corruption estimate c[s] is fit by SGD on
½·Σ_i (Σ_s n_is·c[s] − resid_i)², and rewards are relabeled r′ = r − c[s′]
(s′ = arrival state, which is what our envs' corrupt bonuses attach to)
before GAE. States never implicated keep c[s] = 0, so uncorrupted envs
reduce to plain PPO.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from .ppo import PPOAgent


@struct.dataclass
class CRMDPState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    corruption: jnp.ndarray  # [num_states] f32 — per-state corruption estimate


class PPOCRMDPAgent(PPOAgent):
    """PPO + corruption table. Requires an env with a tabular state index."""

    def __init__(self, env, crmdp_lr: float = 0.05, **kw):
        kw.setdefault("net", "mlp")
        super().__init__(env, **kw)
        assert env.num_states is not None, f"{env.name}: CRMDP needs state_index"
        self.name = "ppo-crmdp"
        self.crmdp_lr = crmdp_lr

    def init(self, key) -> CRMDPState:
        base = super().init(key)
        return CRMDPState(
            params=base.params,
            opt_state=base.opt_state,
            step=base.step,
            corruption=jnp.zeros((self.env.num_states,), jnp.float32),
        )

    def update_corruption(
        self,
        corruption: jnp.ndarray,
        next_idx: jnp.ndarray,   # [T, N] i32 — arrival-state indices
        observed: jnp.ndarray,   # [T, N] f32
        hidden: jnp.ndarray,     # [T, N] f32
    ) -> jnp.ndarray:
        """One SGD step of the least-squares attribution (see module doc)."""
        resid = (observed - hidden).sum(axis=0)            # [N] aggregate only
        pred = corruption[next_idx].sum(axis=0)            # [N]
        err = pred - resid                                 # [N]
        t = next_idx.shape[0]
        # grad[s] = Σ_i err_i · n_is, via scatter-add over the trajectory.
        grad = jnp.zeros_like(corruption).at[next_idx].add(
            jnp.broadcast_to(err[None, :], next_idx.shape)
        )
        return corruption - self.crmdp_lr * grad / t

    def relabel(self, corruption, rewards, next_idx):
        """r′ = r − ĉ(arrival state)."""
        return rewards - corruption[next_idx]
