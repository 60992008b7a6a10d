"""Data-parallel trainer wrapper: ``shard_map`` over the mesh ``data`` axis.

SURVEY.md §2d realized: env instances shard across devices (each device owns
N/D instances and steps them locally — zero cross-device traffic during
collect), learner state is replicated, and the only communication is
``psum``/``pmean`` of gradients / Q-deltas / whitening moments over ICI,
inserted by the family trainers via their ``axis_name`` parameter. The same
trainer code runs 1-chip (axis_name=None) and N-chip — SURVEY.md §4 item 4's
portability requirement.

Replay sharding (DQN): the logical replay buffer's storage rows shard over
``data`` — each device owns an independent capacity/D ring fed by its own
env shard and sampled locally; the write index and size stay replicated
because every device pushes exactly N/D transitions per step. Gradients from
per-device samples are ``pmean``-ed, which is exactly "env shards per host
feed a sharded learner" from BASELINE.json's north star.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
from jax import shard_map
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS


def _psum_stats(stats):
    return jax.tree.map(lambda x: jax.lax.psum(x, DATA_AXIS), stats)


def _path_has(path, name: str) -> bool:
    return any(getattr(p, "name", None) == name for p in path)


def _astate_specs(astate) -> Any:
    """Per-leaf PartitionSpecs: replay storage AND its per-slot priorities
    shard over ``data`` (each device owns an independent capacity/D ring —
    a global priorities array against a local storage shard would scatter
    out of bounds and silently drop transitions); everything else
    replicated."""

    def spec(path, leaf):
        del leaf
        if _path_has(path, "buffer") and (
            _path_has(path, "storage") or _path_has(path, "priorities")
        ):
            return P(DATA_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, astate)


def _vstate_specs(vstate) -> Any:
    return jax.tree.map(lambda _: P(DATA_AXIS), vstate)


class DPTrainer:
    """Wraps any family trainer (tabular/dqn/ppo/crmdp/dummy) for DP over a
    ``('data', 'model')`` mesh. Methods mirror the wrapped trainer's."""

    def __init__(self, trainer, mesh):
        self.trainer = trainer
        self.mesh = mesh
        self.n_dev = mesh.shape[DATA_AXIS]
        assert trainer.vec.n_envs % self.n_dev == 0, (
            f"{trainer.vec.n_envs} envs not divisible by {self.n_dev} devices"
        )

    # -- placement ---------------------------------------------------------
    def init(self, key) -> Tuple[Any, Any]:
        astate, vstate = self.trainer.init(key)
        astate = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            astate,
            _astate_specs(astate),
        )
        vstate = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(self.mesh, P(DATA_AXIS))),
            vstate,
        )
        return astate, vstate

    # -- chunks ------------------------------------------------------------
    def reset_envs(self, key):
        """Fresh (global) VecState; jit/shard_map lays it out over the mesh."""
        return self.trainer.vec.reset(key)

    @property
    def has_warmup(self) -> bool:
        return hasattr(self.trainer, "warmup_chunk")

    def _shard_map(self, local, astate, vstate, extra_out_specs=()):
        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(_astate_specs(astate), _vstate_specs(vstate), P(DATA_AXIS)),
            out_specs=(_astate_specs(astate), _vstate_specs(vstate), P())
            + tuple(extra_out_specs),
            check_vma=False,
        )

    def train_chunk(self, astate, vstate, key, n_steps: int):
        keys = jax.random.split(key, self.n_dev)
        n_extra = 0 if _is_statless(self.trainer) else 1

        def local(astate, vstate_shard, key_shard):
            out = self.trainer.train_chunk(
                astate, vstate_shard, key_shard[0], n_steps, axis_name=DATA_AXIS
            )
            return (out[0], out[1], _psum_stats(out[2])) + tuple(out[3:])

        f = self._shard_map(local, astate, vstate, (P(),) * n_extra)
        return f(astate, vstate, keys)

    def warmup_chunk(self, astate, vstate, key, n_steps: int):
        assert self.has_warmup, (
            f"{type(self.trainer).__name__} has no warmup phase"
        )
        keys = jax.random.split(key, self.n_dev)

        def local(astate, vstate_shard, key_shard):
            astate, vstate_shard, stats = self.trainer.warmup_chunk(
                astate, vstate_shard, key_shard[0], n_steps
            )
            return astate, vstate_shard, _psum_stats(stats)

        f = self._shard_map(local, astate, vstate)
        return f(astate, vstate, keys)

    def eval_chunk(self, astate, vstate, key, n_steps: int, min_episodes=None):
        keys = jax.random.split(key, self.n_dev)
        # Each shard satisfies its share of the episode target locally (the
        # while-loop condition must stay shard-local: a psum in the loop
        # condition would deadlock shards that finish at different times).
        local_eps = (
            None if min_episodes is None
            else max(1, -(-min_episodes // self.n_dev))  # ceil: D shards ×
            # local target must cover the GLOBAL minimum (floor could stop
            # at D·floor(E/D) < E finished episodes).
        )

        def local(astate, vstate_shard, key_shard):
            vstate_shard, stats = self.trainer.eval_chunk(
                astate, vstate_shard, key_shard[0], n_steps,
                min_episodes=local_eps,
            )
            return vstate_shard, _psum_stats(stats)

        f = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(_astate_specs(astate), _vstate_specs(vstate), P(DATA_AXIS)),
            out_specs=(_vstate_specs(vstate), P()),
            check_vma=False,
        )
        return f(astate, vstate, keys)


def _is_statless(trainer) -> bool:
    """Trainers whose train_chunk returns 3 outputs (no loss scalar)."""
    from ..training.dummy import DummyTrainer
    from ..training.tabular import TabularQTrainer
    from ..training.tabular_mxu import MXUTabularQTrainer

    return isinstance(trainer, (TabularQTrainer, MXUTabularQTrainer, DummyTrainer))
