"""Test configuration.

Forces 8 virtual CPU devices and routes all computation to the CPU backend
so the suite is fast and multi-chip sharding paths run without TPU
hardware.  NOTE: in the axon environment a sitecustomize registers the TPU
backend at interpreter startup and overrides JAX_PLATFORMS; the reliable
knobs post-import are XLA_FLAGS (before first CPU-backend touch) and
``jax_default_device``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# XLA:CPU compile times dominate the suite on small hosts (2 vCPUs in the
# axon environment); the persistent cache makes reruns cheap.
from spllt_tpu.utils.jaxconfig import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
