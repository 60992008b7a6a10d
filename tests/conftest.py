"""Test configuration: run correctness tests on CPU with 8 virtual devices.

SURVEY.md §4 item 4: multi-device behavior is tested without a pod via
virtual CPU devices. NOTE: this environment pre-imports jax at interpreter
startup with the axon TPU platform forced, so env vars (JAX_PLATFORMS /
XLA_FLAGS) are consumed before pytest runs — the working mechanism is
jax.config.update BEFORE first backend use, which conftest guarantees.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
