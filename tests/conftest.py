"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding paths
compile and execute without TPU hardware (SURVEY.md §4).  Must run before
the first ``import jax``.
"""

import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU-tunnel sitecustomize (axon) may already have force-selected its
# platform via jax.config.update, which overrides the env var; undo it
# before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "cpp", "build", "oracle")


def _ensure_native():
    if not os.path.exists(ORACLE):
        subprocess.run(["make", "-C", os.path.join(REPO, "cpp")], check=True)


_ensure_native()


@pytest.fixture(scope="session")
def oracle_path():
    return ORACLE
