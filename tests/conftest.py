"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests exercise
`jax.sharding.Mesh` collectives on 8 virtual CPU devices instead
(SURVEY.md §4 item 4).

Note: the live session's sitecustomize pre-imports jax and registers the
'axon' TPU platform before conftest runs, so env vars alone are too late —
we must also flip the already-imported config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR
