"""Trainer registry — mirrors the reference's LEARN_MAP/EVAL_MAP/WARMUP_MAP
(SURVEY.md §2a #3-5): agent alias → fused trainer class."""
from __future__ import annotations

from typing import Callable, Dict

from ..agents.base import Agent
from ..envs.vec import VecEnv
from .common import ChunkStats, eval_chunk, stats_to_host
from .crmdp import CRMDPTrainer
from .dqn import DQNTrainer
from .dummy import DummyTrainer
from .ppo import PPOTrainer
from .tabular import TabularQTrainer

TRAINER_REGISTRY: Dict[str, Callable] = {
    "random": DummyTrainer,
    "single": DummyTrainer,
    "tabular-q": TabularQTrainer,
    "deep-q": DQNTrainer,
    "ppo-mlp": PPOTrainer,
    "ppo-cnn": PPOTrainer,
    "ppo-crmdp": CRMDPTrainer,
}


def make_trainer(agent_alias: str, agent: Agent, vec: VecEnv, **kwargs):
    if agent_alias not in TRAINER_REGISTRY:
        raise KeyError(f"no trainer for agent alias {agent_alias!r}")
    return TRAINER_REGISTRY[agent_alias](agent, vec, **kwargs)


__all__ = [
    "TRAINER_REGISTRY",
    "make_trainer",
    "ChunkStats",
    "eval_chunk",
    "stats_to_host",
]
