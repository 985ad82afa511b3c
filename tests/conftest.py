"""Test configuration: force a virtual 8-device CPU platform.

Sharding/multi-chip tests run on faked host devices
(``--xla_force_host_platform_device_count``), the JAX-idiomatic way to test
meshes without TPU pods.

This environment registers a tunneled TPU PJRT plugin ("axon") in every
python process via sitecustomize; initializing it takes minutes. We therefore
pin ``jax_platforms`` to cpu *after* import (the plugin registers eagerly but
initializes lazily), which keeps the suite fast and hermetic.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in _flags:
    # 8 virtual devices timeslice this host's one core: at reference-scale
    # dryrun shapes a device can reach an all-reduce minutes after its
    # peers, and XLA-CPU's default rendezvous termination window (40 s)
    # kills the healthy run (see __graft_entry__._virtual_cpu_flags).
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute test (subprocess CLIs, big compiles)"
    )


def has_reference():
    return os.path.isdir(REFERENCE)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
