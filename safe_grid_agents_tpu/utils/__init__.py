"""Utilities: on-device replay, metrics, checkpointing."""
