"""Test configuration: run on a virtual 8-device CPU mesh with f64.

Real multi-chip TPU hardware is not available in CI; sharding paths are
validated on virtual CPU devices (the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip).

Note: the environment's sitecustomize registers the axon TPU backend at
interpreter startup and presets JAX_PLATFORMS=axon, so env mutation alone
is not reliable here — jax.config.update is authoritative as long as no
backend has been initialized yet (conftest runs before any test imports
trigger device lookup).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after every test module.

    On the single-core CI box the XLA CPU client segfaults inside
    backend_compile_and_load once a few hundred executables have
    accumulated over the suite (reproducibly at the same test, NOT
    reproducible when its file runs alone or with only its neighbors;
    128 GB RAM mostly free, so it is compiler/code-arena state, not
    memory).  Dropping the jit caches between modules bounds the live
    executable count; modules re-trace their own functions anyway, so
    the wall-clock cost is small.
    """
    yield
    jax.clear_caches()
