"""Test configuration: run all JAX tests on a virtual 8-device CPU mesh.

Mirrors the standard JAX approach for testing multi-chip sharding without hardware
(``--xla_force_host_platform_device_count``). Must run before jax is imported anywhere.
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
_existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _existing:
    os.environ["XLA_FLAGS"] = (_existing + " " + _FLAG).strip()
# The harness presets JAX_PLATFORMS=axon (single real TPU chip); tests must run on the
# virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
