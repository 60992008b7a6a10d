"""PPO agents — MLP and CNN actor-critics (reference ppo/agents/{base,mlp,
cnn}.py, SURVEY.md §2a #10).

Reference algorithm [H]: collect rollouts, compute discounted returns and
advantages, optimize the clipped surrogate (``--clipping``) with a value
loss and entropy bonus (``--entropy-bonus``) for ``--epochs`` passes.

TPU-first shape: instead of the reference's "``--rollouts`` episodes per
update" the vectorized analogue collects a fixed [T, N] step matrix per
update (time-major scan over N lockstep envs), uses GAE(λ), and fuses
collect + GAE + minibatched multi-epoch optimization into one jitted chunk
(SURVEY.md §7 step 6). Rollout storage holds compact env states;
observations are re-rendered on demand.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .base import Agent
from .networks import ActorCriticCNN, ActorCriticMLP


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # i32 — env steps seen


class PPOAgent(Agent):
    name = "ppo-mlp"

    def __init__(
        self,
        env,
        net: str = "mlp",
        lr: float = 3e-4,
        discount: float = 0.99,
        gae_lambda: float = 0.95,
        clipping: float = 0.2,
        entropy_bonus: float = 0.01,
        entropy_final: float | None = None,
        entropy_anneal_steps: int = 0,
        value_coef: float = 0.5,
        epochs: int = 4,
        n_minibatches: int = 4,
        max_grad_norm: float = 0.5,
        hidden: tuple = (128, 128),
    ):
        super().__init__(env)
        self.hidden = tuple(hidden)
        if net == "mlp":
            self.net = ActorCriticMLP(n_actions=env.n_actions, hidden=hidden)
        elif net == "cnn":
            self.net = ActorCriticCNN(n_actions=env.n_actions, hidden=hidden[0])
        elif net == "pallas":
            # Fused pallas forward (ops/fused_mlp.py); fixed 128-wide layers.
            from ..ops.fused_mlp import PallasActorCriticMLP

            self.net = PallasActorCriticMLP(n_actions=env.n_actions)
        elif net == "table":
            # Table-folded fast path: compiled envs only (see networks.py).
            from ..envs.compiled import CompiledEnv
            from .networks import make_table_actor_critic

            assert isinstance(env, CompiledEnv), "net='table' needs a compiled env"
            s = env.obs_table.shape[0]
            self.net = make_table_actor_critic(
                env.obs_table.reshape(s, -1), env.n_actions, hidden
            )
            self._table_net = True
        else:
            raise ValueError(f"unknown net {net!r}")
        self.name = f"ppo-{net}"
        self.discount = discount
        self.gae_lambda = gae_lambda
        self.clipping = clipping
        self.entropy_bonus = entropy_bonus
        self.entropy_final = entropy_bonus if entropy_final is None else entropy_final
        self.entropy_anneal_steps = entropy_anneal_steps
        self.value_coef = value_coef
        self.epochs = epochs
        self.n_minibatches = n_minibatches
        self.lr = lr
        self.max_grad_norm = max_grad_norm
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(lr)
        )
        self._v_observe = jax.vmap(env.observe)

    def init(self, key) -> PPOState:
        if getattr(self, "_table_net", False):
            params = self.net.init(key, jnp.zeros((1,), jnp.int32))
        else:
            obs = self.env.observe(self.env.reset(key))
            params = self.net.init(key, obs[None])
        return PPOState(
            params=params, opt_state=self.tx.init(params), step=jnp.int32(0)
        )

    def policy_value(self, params, env_states):
        """Batched (logits, value) from stacked compact env states."""
        if getattr(self, "_table_net", False):
            return self.net.apply(params, env_states.idx)
        return self.net.apply(params, self._v_observe(env_states))

    def for_env(self, env):
        c = super().for_env(env)
        if getattr(self, "_table_net", False):
            # Rebind the fold table to the new env (same grid/param shapes).
            from .networks import make_table_actor_critic

            s = env.obs_table.shape[0]
            c.net = make_table_actor_critic(
                env.obs_table.reshape(s, -1), env.n_actions, self.hidden
            )
        return c

    def act(self, astate: PPOState, env_states, key):
        del key
        logits, _ = self.policy_value(astate.params, env_states)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    def act_explore(self, astate: PPOState, env_states, key):
        logits, _ = self.policy_value(astate.params, env_states)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    def sample_action(self, params, env_states, key):
        """(action, log_prob, value) for the collect phase."""
        logits, value = self.policy_value(params, env_states)
        action = jax.random.categorical(key, logits).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits)
        logp_a = jnp.take_along_axis(logp, action[:, None], axis=-1).squeeze(-1)
        return action, logp_a, value

    def entropy_coef(self, step) -> jnp.ndarray:
        """Linearly annealed entropy bonus (constant when anneal_steps=0) —
        high early exploration pressure that decays once the return signal
        is established; stabilizes the sparse-goal envs."""
        if self.entropy_anneal_steps <= 0:
            return jnp.float32(self.entropy_bonus)
        frac = jnp.clip(step / self.entropy_anneal_steps, 0.0, 1.0)
        return self.entropy_bonus + frac * (self.entropy_final - self.entropy_bonus)

    def loss(self, params, batch, entropy_coef=None) -> jnp.ndarray:
        """Clipped surrogate + value + entropy over one flat minibatch.

        ``batch`` dict leaves: states (pytree [B,...]), actions, old_logp,
        advantages, returns — all [B]. ``entropy_coef`` overrides the static
        bonus (used by the annealing schedule).
        """
        logits, value = self.policy_value(params, batch["states"])
        logp = jax.nn.log_softmax(logits)
        logp_a = jnp.take_along_axis(
            logp, batch["actions"][:, None], axis=-1
        ).squeeze(-1)
        ratio = jnp.exp(logp_a - batch["old_logp"])
        adv = batch["advantages"]
        surr = jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1.0 - self.clipping, 1.0 + self.clipping) * adv,
        )
        policy_loss = -surr.mean()
        value_loss = 0.5 * jnp.square(value - batch["returns"]).mean()
        entropy = -(jnp.exp(logp) * logp).sum(-1).mean()
        coef = jnp.float32(self.entropy_bonus) if entropy_coef is None else entropy_coef
        return policy_loss + self.value_coef * value_loss - coef * entropy


class PPOCNNAgent(PPOAgent):
    """Convenience alias used by the agent registry."""

    def __init__(self, env, **kw):
        kw.setdefault("net", "cnn")
        super().__init__(env, **kw)
