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
