"""Multi-host runtime (SURVEY.md §5 "Distributed communication backend":
one process per host joins via ``jax.distributed.initialize``; collectives
ride ICI within a slice, DCN across slices — all inserted by XLA, no
NCCL/MPI anywhere).

Usage on a pod slice (one command per host, e.g. via the TPU VM launcher):

    python -m safe_grid_agents_tpu <env> <agent> --n-devices <global> ...

with the standard JAX cluster env vars set (on Cloud TPU they are
auto-detected and ``initialize()`` needs no arguments). Call
``ensure_initialized()`` before any jax device query; it is a no-op for
single-process runs, so the same CLI works 1-chip and N-host.
"""
from __future__ import annotations

import os

import jax

_initialized = False


def ensure_initialized(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the jax.distributed cluster when multi-process env vars (or
    explicit args) are present; otherwise do nothing.

    Auto-detection: Cloud TPU metadata (no args needed) or the standard
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    variables.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if coordinator_address is None and num == 0:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num or None,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    _initialized = True


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints."""
    return jax.process_index() == 0
