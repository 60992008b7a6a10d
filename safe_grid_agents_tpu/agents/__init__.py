"""Agent registry — mirrors the reference's ``AGENT_MAP`` (SURVEY.md §2a #2):
alias → agent class. Aliases follow the reference CLI surface."""
from __future__ import annotations

from typing import Callable, Dict

from .base import Agent
from .crmdp import PPOCRMDPAgent
from .dqn import DQNAgent
from .dummy import RandomAgent, SingleActionAgent
from .ppo import PPOAgent, PPOCNNAgent
from .tabular import TabularQAgent

AGENT_REGISTRY: Dict[str, Callable[..., Agent]] = {
    "random": RandomAgent,
    "single": SingleActionAgent,
    "tabular-q": TabularQAgent,
    "deep-q": DQNAgent,
    "ppo-mlp": PPOAgent,
    "ppo-cnn": PPOCNNAgent,
    "ppo-crmdp": PPOCRMDPAgent,
}


def make_agent(alias: str, env, **kwargs) -> Agent:
    if alias not in AGENT_REGISTRY:
        raise KeyError(f"unknown agent alias {alias!r}; known: {sorted(AGENT_REGISTRY)}")
    return AGENT_REGISTRY[alias](env, **kwargs)
