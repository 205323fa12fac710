"""Test configuration: run everything on CPU with 8 virtual devices so the
pjit/mesh code paths are exercised without TPU hardware (the standard JAX
answer to multi-device testing; see SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
