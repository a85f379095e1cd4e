"""Test harness: force CPU backend with 8 virtual devices.

Multi-chip sharding (pjit/shard_map over a Mesh) is validated on a virtual
8-device CPU mesh since only one real TPU chip is reachable in CI.

Note: the environment's sitecustomize imports jax at interpreter startup
(registering the axon TPU backend), so plain env vars are too late here —
we override through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # XLA's in-process CPU collectives SIGABRT if a device thread misses
    # the rendezvous for 40 s; 8 virtual devices serialized on a 1-core
    # host can blow that (observed: dryrun abort, rendezvous.cc).
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
