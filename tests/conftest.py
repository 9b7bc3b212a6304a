"""Test harness: run everything on CPU with 8 virtual XLA devices.

This is the TPU-world substitute for multi-node test clusters (SURVEY.md §4):
sharding/collective logic is validated on a virtual 8-device mesh; numerics
are validated against independent numpy golden implementations.

NOTE: this environment ships a TPU plugin that overrides the JAX_PLATFORMS
env var, so the config API (which takes precedence) is used instead of
XLA_FLAGS/env.
"""
import os

# Belt and suspenders for subprocesses that re-read the env.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # On an oversubscribed CPU host (CI boxes here can be 1-core), slow
    # scheduling can push an in-flight 8-way in-process collective
    # rendezvous past its DEFAULT 40 s termination watchdog -> silent
    # SIGABRT (xla/.../rendezvous.cc). 300 s gives legitimate stragglers
    # (e.g. a concurrent single-core XLA compile) room while still
    # failing a genuinely deadlocked test in bounded time.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=300"
              " --xla_cpu_collective_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# Must run before jax initializes any backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
