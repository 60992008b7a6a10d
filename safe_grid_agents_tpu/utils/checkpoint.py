"""Checkpoint / resume via orbax (SURVEY.md §5 "Checkpoint / resume": absent
in the reference; required here so a run is bitwise resumable — agent state,
env states, and RNG keys all live in one pytree and restore exactly)."""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


_MANAGERS: dict = {}


def _manager(path: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    """One cached manager per directory: concurrent managers on the same
    path each run their own max_to_keep GC and can delete a sibling's
    in-flight async write."""
    path = os.path.abspath(path)
    mgr = _MANAGERS.get(path)
    if mgr is None:
        mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        _MANAGERS[path] = mgr
    return mgr


def save(path: str, step: int, state: Any, max_to_keep: int = 3, wait: bool = True) -> None:
    """Save the full training pytree (astate, vstate, key, ...) at ``step``.

    ``wait=False`` returns as soon as device arrays are snapshotted (orbax
    writes asynchronously in the background) — the SURVEY.md §5 "async
    checkpointing" requirement; the next ``save``/``restore`` on the same
    path barriers on completion.
    """
    mgr = _manager(path, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def wait_all() -> None:
    """Barrier on all in-flight async saves (called at end of training and
    at interpreter exit; cached managers stay open for reuse)."""
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()


def close_all() -> None:
    wait_all()
    while _MANAGERS:
        _, mgr = _MANAGERS.popitem()
        mgr.close()


import atexit  # noqa: E402

atexit.register(close_all)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    mgr = _manager(path)
    return mgr.latest_step()


def restore(path: str, example_state: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``example_state``."""
    mgr = _manager(path)
    step = mgr.latest_step() if step is None else step
    assert step is not None, f"no checkpoint under {path}"
    return mgr.restore(step, args=ocp.args.StandardRestore(example_state))


def restore_latest_valid(path: str, example_state: Any):
    """Failure-tolerant restore (SURVEY.md §5 failure detection/recovery):
    try checkpoints newest-first, skipping any that fail to load (truncated
    by a crash mid-write, corrupted storage). Returns (step, state) or
    (None, None) when nothing usable exists.

    Uses the low-level StandardCheckpointer per step directory rather than
    the CheckpointManager: a single torn step poisons the manager's layout
    inference for ALL steps (observed with orbax 0.x), while per-directory
    restores stay independent.
    """
    if not os.path.isdir(path):
        return None, None
    steps = sorted(
        (int(d) for d in os.listdir(path) if d.isdigit()), reverse=True
    )
    ckptr = ocp.StandardCheckpointer()
    for step in steps:
        try:
            out = ckptr.restore(
                os.path.join(os.path.abspath(path), str(step), "default"),
                example_state,
            )
            return step, out
        except Exception as e:  # corrupted/partial save → fall back one
            print(f"checkpoint step {step} unreadable ({type(e).__name__}); "
                  f"falling back", flush=True)
    return None, None
