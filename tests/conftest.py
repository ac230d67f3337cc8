"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/) is exercised without TPU hardware via
XLA's host-platform device-count override — the standard JAX pattern for
testing pjit/shard_map programs on one machine.
"""
import functools
import os
import sys

# The environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel) and injects
# an axon PJRT plugin via sitecustomize, which (a) hijacks the backend and
# (b) makes CPU-only processes pathologically slow (op dispatch through the
# plugin) or hang. The plugin is gated on PALLAS_AXON_POOL_IPS and loads at
# interpreter start, so the only reliable opt-out is to re-exec the test
# process once with a clean environment. The re-exec happens in
# pytest_configure (not at import) so pytest's fd capture can be suspended
# first — otherwise the child's output goes to the dead parent's capture file.
_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "_SLAM_TESTS_REEXEC"
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy soak/integration tests — excluded from the default "
        "(fast, <=10 min) tier; run with SLAM_SLOW_TESTS=1",
    )
    if _NEEDS_REEXEC:
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["_SLAM_TESTS_REEXEC"] = "1"
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Eager (op-by-op) dispatch is pathologically slow in this environment
# (~0.5 s/op); the persistent cache makes repeated test runs cheap and the
# tests below jit their hot calls.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """Fast/slow tiers (VERDICT r03 #9): the default invocation
    (`python -m pytest tests/ -x -q`) must gate in <= 10 min, so tests
    marked `slow` (long soaks, heavyweight integration) are skipped unless
    SLAM_SLOW_TESTS=1 is set."""
    import pytest as _pytest

    if os.environ.get("SLAM_SLOW_TESTS"):
        return
    skip = _pytest.mark.skip(reason="slow tier (set SLAM_SLOW_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
