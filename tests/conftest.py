"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests exercise
`jax.sharding.Mesh` collectives on 8 virtual CPU devices instead
(SURVEY.md §4 item 4).

Note: the live session's sitecustomize pre-imports jax and registers the
'axon' TPU platform before conftest runs, so env vars alone are too late —
we must also flip the already-imported config.
"""
import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# gate-control calibrations cache to disk (eval/gate_control.py); tests
# must not pollute the repo's committed chip cache with CPU-keyed entries
os.environ.setdefault("TTS_ARABIC_GATE_CACHE",
                      tempfile.mkdtemp(prefix="gate_cache_"))
# The axon TPU plugin (PYTHONPATH=/root/.axon_site) ignores
# JAX_PLATFORMS=cpu: its registered backend factory dials the remote chip
# tunnel inside backends() init, and a half-dead tunnel HANGS that connect
# indefinitely (observed 2026-08-18: every CPU-only run blocked in
# make_c_api_client). Tests are CPU-only by design — drop the plugin from
# this process AND from child-process PYTHONPATHs (the multiprocess mesh
# test spawns workers that inherit the env).
sys.path[:] = [p for p in sys.path if "axon" not in p]
if "PYTHONPATH" in os.environ:
    _pp = [p for p in os.environ["PYTHONPATH"].split(os.pathsep)
           if p and "axon" not in p]
    if _pp:
        os.environ["PYTHONPATH"] = os.pathsep.join(_pp)
    else:
        del os.environ["PYTHONPATH"]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# If a sitecustomize pre-imported jax, the plugin is already registered
# and the path scrub above is too late — remove its backend factory
# before anything initializes backends.
try:
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
assert jax.devices()[0].platform == "cpu"

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR
