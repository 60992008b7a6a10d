"""Pallas TPU kernels for hot ops (interpret mode on CPU backends)."""
