"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must be runnable without TPU hardware; sharding code is exercised on
XLA's host-platform device simulation (SURVEY.md section 4). The same pjit
code runs unchanged on a real pod slice.
"""
import os

# The shell environment pins JAX_PLATFORMS to the TPU tunnel; tests must run
# on the virtual CPU mesh. The container's sitecustomize imports jax at
# interpreter startup, so the env var is already baked into jax.config —
# override via jax.config.update (effective until first backend init).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(0)
