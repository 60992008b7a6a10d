"""CLI layer: alias-based argument surface + experiment driver."""
from .main import main, run
from .parsing import prepare_parser

__all__ = ["main", "run", "prepare_parser"]
