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


def _make_table_net(obs_flat, hidden, activation, head_fn):
    """Shared table-folding builder (see make_table_actor_critic's doc for
    the algebra). ``head_fn(x)`` produces the network's output(s) from the
    final hidden layer inside the compact module scope."""
    import numpy as np

    obs_const = np.asarray(obs_flat, np.float32)  # [S, D] static
    d = obs_const.shape[1]

    class TableNet(nn.Module):
        @nn.compact
        def __call__(self, idx):
            init = nn.initializers.lecun_normal()
            w1 = self.param("w1", init, (d, hidden[0]))
            b1 = self.param("b1", nn.initializers.zeros, (hidden[0],))
            folded = jnp.asarray(obs_const) @ w1          # [S, H] — hoistable
            x = activation(folded[idx] + b1)
            for h in hidden[1:]:
                x = activation(nn.Dense(h)(x))
            return head_fn(x)

    return TableNet()


def make_table_q(obs_flat, n_actions: int, hidden=(128, 128)):
    """Table-folded Q network for compiled envs: state indices → Q[a]."""
    return _make_table_net(
        obs_flat, hidden, nn.relu, lambda x: nn.Dense(n_actions)(x)
    )


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

    def head(x):
        return nn.Dense(n_actions)(x), nn.Dense(1)(x).squeeze(-1)

    return _make_table_net(obs_flat, hidden, nn.tanh, head)


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
