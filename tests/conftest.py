"""Test configuration: run all JAX tests on a virtual 8-device CPU mesh.

Mirrors the standard JAX approach for testing multi-chip sharding without hardware
(``--xla_force_host_platform_device_count``). The harness's sitecustomize imports jax
at interpreter startup with ``JAX_PLATFORMS=axon`` (one real TPU via a tunnel), so env
vars alone are too late — we update jax config before any backend initializes."""

import os

# ALLOPHANT_TEST_TPU=1 keeps the real TPU backend for the device-gated tests
# (Pallas kernels whose ops have no interpret-mode lowering, e.g. the Mosaic
# PRNG behind in-kernel attention dropout); everything else runs on the
# virtual CPU mesh.
if os.environ.get("ALLOPHANT_TEST_TPU") == "1":
    import jax
else:
    _FLAG = "--xla_force_host_platform_device_count=8"
    _existing = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _existing:
        os.environ["XLA_FLAGS"] = (_existing + " " + _FLAG).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
