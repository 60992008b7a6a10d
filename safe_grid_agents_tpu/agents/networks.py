"""Policy/value networks (flax) for the deep agents.

Counterparts of the reference's torch nn.Modules (SURVEY.md §2a #9 DQN MLP,
#10 PPO MLP/CNN). TPU notes: hidden widths default to 128 (MXU tile width),
activations are fused by XLA; observations arrive as [P, H, W] one-hot
float planes from ``Env.observe`` and are flattened (MLP) or transposed to
NHWC (CNN).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class QMLP(nn.Module):
    """State-action value head: obs planes → Q[a]. (reference deep.py MLP)"""

    n_actions: int
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, obs):  # obs [..., P, H, W]
        x = obs.reshape(*obs.shape[:-3], -1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.n_actions)(x)


class ActorCriticMLP(nn.Module):
    """Shared-trunk actor-critic over flattened planes (reference ppo/mlp)."""

    n_actions: int
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, obs):
        x = obs.reshape(*obs.shape[:-3], -1)
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        logits = nn.Dense(self.n_actions)(x)
        value = nn.Dense(1)(x).squeeze(-1)
        return logits, value


def make_table_q(obs_flat, n_actions: int, hidden=(128, 128)):
    """Table-folded Q network for compiled envs (see make_table_actor_critic
    for the algebra). Consumes state indices, returns Q[a]."""
    import numpy as np

    obs_const = np.asarray(obs_flat, np.float32)
    d = obs_const.shape[1]

    class TableQMLP(nn.Module):
        @nn.compact
        def __call__(self, idx):
            init = nn.initializers.lecun_normal()
            w1 = self.param("w1", init, (d, hidden[0]))
            b1 = self.param("b1", nn.initializers.zeros, (hidden[0],))
            folded = jnp.asarray(obs_const) @ w1
            x = nn.relu(folded[idx] + b1)
            for h in hidden[1:]:
                x = nn.relu(nn.Dense(h)(x))
            return nn.Dense(n_actions)(x)

    return TableQMLP()


def make_table_actor_critic(obs_flat, n_actions: int, hidden=(128, 128)):
    """Table-folded actor-critic for compiled envs.

    For a compiled env, the observation of state ``i`` is a static row
    ``O[i]`` of the obs table, so the first dense layer satisfies
    ``O[idx] @ W1 = (O @ W1)[idx]`` — fold the table into the weights and
    the whole observation render + first matmul become ONE [S, H] row
    gather. Inside a collect scan, XLA hoists ``O @ W1`` (loop-invariant),
    so its cost amortizes to zero; in update phases it is an [S, D, H]
    matmul at S of a few hundred — far cheaper than per-sample [B, D, H].

    Consumes state *indices* (i32 [B]) instead of observation planes.
    """
    import numpy as np

    obs_const = np.asarray(obs_flat, np.float32)  # [S, D] static
    d = obs_const.shape[1]

    class TableActorCriticMLP(nn.Module):
        @nn.compact
        def __call__(self, idx):
            init = nn.initializers.lecun_normal()
            w1 = self.param("w1", init, (d, hidden[0]))
            b1 = self.param("b1", nn.initializers.zeros, (hidden[0],))
            folded = jnp.asarray(obs_const) @ w1          # [S, H] — hoistable
            x = jnp.tanh(folded[idx] + b1)
            for h in hidden[1:]:
                x = nn.tanh(nn.Dense(h)(x))
            logits = nn.Dense(n_actions)(x)
            value = nn.Dense(1)(x).squeeze(-1)
            return logits, value

    return TableActorCriticMLP()


class ActorCriticCNN(nn.Module):
    """Conv trunk over one-hot planes (reference ppo/cnn). Input [..., P, H, W]."""

    n_actions: int
    channels: Sequence[int] = (32, 64)
    hidden: int = 128

    @nn.compact
    def __call__(self, obs):
        # [..., P, H, W] → [..., H, W, P] (NHWC for XLA conv on TPU)
        x = jnp.moveaxis(obs, -3, -1)
        for ch in self.channels:
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME")(x))
        x = x.reshape(*x.shape[:-3], -1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        logits = nn.Dense(self.n_actions)(x)
        value = nn.Dense(1)(x).squeeze(-1)
        return logits, value
