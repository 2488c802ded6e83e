"""Test configuration: CPU backend with 8 virtual devices, float64 on.

Multi-chip sharding is validated on a fake CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver
dry-runs the multi-chip path; numerics tests use float64 to compare
against GEMMA's double-precision golden values.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Belt and braces: the env var is read at backend init, but if a plugin
# imported jax before this conftest ran, force the platform via config
# (works as long as no backend has been initialised yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; got " + jax.default_backend())


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (skipped by "
        "`make fast-check`)")
