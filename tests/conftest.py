"""Test configuration: run correctness tests on CPU with 8 virtual devices.

SURVEY.md §4 item 4: multi-device behavior is tested without a pod via
``--xla_force_host_platform_device_count``. This must be set before jax
initializes, hence module scope here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
