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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # cap codegen at AVX512: this image's XLA:CPU defaults to the
    # compile machine's full feature set (incl. AMX) and segfaults
    # non-deterministically compiling large programs (the BSLMM MCMC
    # chain) after VM migration across host generations
    flags = (flags + " --xla_cpu_max_isa=AVX512").strip()
os.environ["XLA_FLAGS"] = flags

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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU on this image segfaults non-deterministically when one
    long-lived process accumulates hundreds of compiled executables
    (crash in backend_compile_and_load, moving between tests as the
    suite is reordered).  Dropping the compiled-program caches between
    test modules keeps the live-executable count bounded; shared
    programs recompile per module (CPU compiles are cheap)."""
    yield
    jax.clear_caches()
