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

import jax
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
        axis_name: str | None = None,
    ) -> jnp.ndarray:
        """One normalized-LMS step of the least-squares attribution (module
        doc). Per-env errors are normalized by that env's Σ_s n_is² (the
        squared norm of its visit-count vector), which keeps the update
        stable for any visit pattern (plain SGD diverges when a policy camps
        on one state: the gradient scales with visits²). Under a data axis,
        per-shard updates are pmean-ed so the replicated table stays
        identical across devices."""
        resid = (observed - hidden).sum(axis=0)            # [N] aggregate only
        pred = corruption[next_idx].sum(axis=0)            # [N]
        err = pred - resid                                 # [N]
        # Σ_s n_is² in O(T·N log T): sort each env's visited indices; each
        # element's equal-run length is its state's visit count, and summing
        # run lengths over elements gives Σ_s n_s² (avoids the O(T²·N)
        # pairwise-equality tensor, which OOMs at large chunks).
        sorted_idx = jnp.sort(next_idx, axis=0)            # [T, N]

        def _env_norm(col):
            left = jnp.searchsorted(col, col, side="left")
            right = jnp.searchsorted(col, col, side="right")
            return (right - left).sum()

        denom = jax.vmap(_env_norm, in_axes=1)(sorted_idx).astype(jnp.float32)
        err_norm = err / jnp.maximum(denom, 1.0)             # [N]
        n = next_idx.shape[1]
        delta = jnp.zeros_like(corruption).at[next_idx].add(
            jnp.broadcast_to(err_norm[None, :], next_idx.shape)
        ) / n
        if axis_name is not None:
            delta = jax.lax.pmean(delta, axis_name)
        return corruption - self.crmdp_lr * delta

    def relabel(self, corruption, rewards, next_idx):
        """r′ = r − ĉ(arrival state)."""
        return rewards - corruption[next_idx]
