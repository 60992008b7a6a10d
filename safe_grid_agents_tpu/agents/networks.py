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
