"""Shared grid mechanics for the array engine.

Replaces pycolab's sprite/drape machinery (SURVEY.md §2b "pycolab engine":
only the semantics are kept — per-step agent update, impassable walls, board
render to a char grid). Everything here is branch-free and shape-static so it
vectorizes with ``vmap`` and compiles under ``jit``.

Canonical action enum (matches ai-safety-gridworlds, SURVEY.md §2b):
UP=0, DOWN=1, LEFT=2, RIGHT=3.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3
N_ACTIONS = 4

# Row/col deltas indexed by action.
DELTAS = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]], dtype=np.int32)

# Global char palette: board() renders cell-type ids from this table so every
# env shares one integer encoding (the reference's gym wrapper exposed the
# raw pycolab char board as integer codes — SURVEY.md §2b "Gym wrapper").
CHARS: Dict[str, int] = {
    " ": 0,   # floor
    "#": 1,   # wall
    "A": 2,   # agent
    "G": 3,   # goal
    "L": 4,   # lava
    "W": 5,   # water / whisky (env-scoped meaning)
    "X": 6,   # sokoban box
    ">": 7,   # boat-race checkpoint (rightward)
    "v": 8,   # boat-race checkpoint (downward)
    "<": 9,   # boat-race checkpoint (leftward)
    "^": 10,  # boat-race checkpoint (upward)
    "t": 11,  # dry tomato
    "T": 12,  # watered tomato
    "O": 13,  # observation-corrupting bucket tile
    "I": 14,  # interruption tile
    "B": 15,  # interruption-disabling button
    "P": 16,  # punishment tile
    "S": 17,  # supervisor marker
    "C": 18,  # corrupt-reward cell (toy CRMDP worlds)
    "V": 19,  # conveyor object (vase/sushi)
    "F": 20,  # friend-foe reward box
    "b": 21,  # conveyor belt tile
}


def parse_art(art: List[str]) -> Tuple[np.ndarray, Dict[str, List[Tuple[int, int]]]]:
    """Parse ASCII art into (char-id grid, positions-by-char).

    Returns the static board as int8 ids (agent char included where drawn)
    and a dict mapping each non-floor char to its list of (row, col) cells.
    """
    h, w = len(art), len(art[0])
    grid = np.zeros((h, w), dtype=np.int8)
    where: Dict[str, List[Tuple[int, int]]] = {}
    for r, row in enumerate(art):
        assert len(row) == w, f"ragged art row {r}"
        for c, ch in enumerate(row):
            grid[r, c] = CHARS[ch]
            if ch != " ":
                where.setdefault(ch, []).append((r, c))
    return grid, where


def walls_from_art(art: List[str]) -> np.ndarray:
    """Boolean [H, W] wall mask. Every board must have a solid border so
    moves can never index out of bounds (checked here)."""
    grid, _ = parse_art(art)
    walls = grid == CHARS["#"]
    assert walls[0, :].all() and walls[-1, :].all(), "top/bottom border must be walls"
    assert walls[:, 0].all() and walls[:, -1].all(), "left/right border must be walls"
    return walls


def move(pos: jnp.ndarray, action: jnp.ndarray, passable: jnp.ndarray) -> jnp.ndarray:
    """Propose pos+delta; stay in place if the target cell is impassable.

    ``pos`` is [2] int32 (row, col); ``passable`` is a static [H, W] bool map
    (True where the agent may stand). Boards have wall borders, so the
    proposed cell is always in bounds.
    """
    delta = jnp.asarray(DELTAS)[action]
    nxt = pos + delta
    ok = passable[nxt[0], nxt[1]]
    return jnp.where(ok, nxt, pos)


def pos_plane(pos: jnp.ndarray, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """One-hot [H, W] plane with a 1 at ``pos`` — the agent/object render."""
    return jnp.zeros((h, w), dtype).at[pos[0], pos[1]].set(1)


def at_cell(pos: jnp.ndarray, mask: np.ndarray) -> jnp.ndarray:
    """True iff ``pos`` lies on a cell of the static boolean ``mask``."""
    return jnp.asarray(mask)[pos[0], pos[1]]


def same_pos(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b)
