"""Tensor parallelism over the mesh ``model`` axis — the GSPMD runtime.

SURVEY.md §2d reserved the ``model`` axis so TP specs are *expressible*;
this module makes them *executable*: the policy/Q network's dense layers
shard Megatron-style over ``model`` (alternating column-parallel
``P(None, 'model')`` / row-parallel ``P('model', None)`` kernels, so a
col→row pair needs exactly one reduction and no activation resharding in
between), while env instances shard over ``data`` — dp×tp on one mesh.

Unlike ``dp.DPTrainer`` (explicit ``shard_map`` + hand-placed collectives),
this runtime follows the scaling-book recipe: place the operands with
``NamedSharding``s and hand the *unmodified* single-device trainer program to
``jit`` — GSPMD chooses the partitioning of every intermediate and inserts
the collectives (the layer-boundary reduce for row-parallel matmuls, the
gradient all-reduces over ``data``). Gridworld-scale nets never *need* TP
(COMPONENT_MAP.md documents that); this exists to prove the mesh design
carries real multi-axis shardings end-to-end through collect + GAE +
minibatched optimization, the same program shape a transformer policy would
use.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def tp_param_specs(params: Any, min_dim: int = 8) -> dict:
    """Megatron-style specs for a dense param tree.

    Returns ``{(layer_name, leaf_name): PartitionSpec}`` covering kernels
    and their biases. Kernels whose both dims are >= ``min_dim`` alternate
    column-parallel / row-parallel in layer order; tiny head kernels (A=4
    logits, scalar value) stay replicated. A bias after a column-parallel
    kernel is sharded over ``model`` (it adds to a sharded activation); all
    other biases replicate.
    """
    kernels = [
        (path, leaf.shape)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if getattr(path[-1], "key", None) == "kernel" and leaf.ndim == 2
    ]
    specs: dict = {}
    col = True  # start column-parallel
    for path, shape in kernels:
        layer = getattr(path[-2], "key", None)
        if min(shape) < min_dim:
            continue  # heads: replicated
        if col:
            specs[(layer, "kernel")] = P(None, MODEL_AXIS)
            specs[(layer, "bias")] = P(MODEL_AXIS)
        else:
            specs[(layer, "kernel")] = P(MODEL_AXIS, None)
        col = not col
    return specs


def _leaf_spec(path, specs: dict) -> P:
    """Spec for any astate leaf: match the trailing (layer, name) path pair
    so optimizer moments (mu/nu mirror the param tree) shard like their
    params; replay storage shards over data; everything else replicates."""
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if len(names) >= 2 and (names[-2], names[-1]) in specs:
        return specs[(names[-2], names[-1])]
    if "buffer" in names and ("storage" in names or "priorities" in names):
        return P(DATA_AXIS)
    return P()


class GSPMDTrainer:
    """dp×tp wrapper for the deep-family trainers (ppo*/deep-q).

    Mirrors ``DPTrainer``'s surface (init / train_chunk / eval_chunk /
    warmup_chunk / reset_envs) but partitions via operand placement + GSPMD
    instead of ``shard_map``: the wrapped trainer runs with
    ``axis_name=None`` — its program is literally the single-device one.
    """

    def __init__(self, trainer, mesh: Mesh):
        self.trainer = trainer
        self.mesh = mesh
        n_data = mesh.shape[DATA_AXIS]
        assert trainer.vec.n_envs % n_data == 0, (
            f"{trainer.vec.n_envs} envs not divisible by data={n_data}"
        )

    def _place(self, astate, vstate):
        specs = tp_param_specs(astate.params)
        astate = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(
                x, NamedSharding(self.mesh, _leaf_spec(p, specs))
            ),
            astate,
        )
        vstate = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(self.mesh, P(DATA_AXIS))
            ),
            vstate,
        )
        return astate, vstate

    def init(self, key) -> Tuple[Any, Any]:
        return self._place(*self.trainer.init(key))

    def reset_envs(self, key):
        return self.trainer.vec.reset(key)

    @property
    def has_warmup(self) -> bool:
        return hasattr(self.trainer, "warmup_chunk")

    # The trainer methods are already pure jittable functions of placed
    # operands; jit infers partitioning from the committed shardings.
    def train_chunk(self, astate, vstate, key, n_steps: int):
        return self.trainer.train_chunk(astate, vstate, key, n_steps)

    def warmup_chunk(self, astate, vstate, key, n_steps: int):
        return self.trainer.warmup_chunk(astate, vstate, key, n_steps)

    def eval_chunk(self, astate, vstate, key, n_steps: int, min_episodes=None):
        return self.trainer.eval_chunk(
            astate, vstate, key, n_steps, min_episodes=min_episodes
        )
