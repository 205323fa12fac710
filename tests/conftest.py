"""Test configuration: run everything on CPU with 8 virtual devices so the
pjit/mesh code paths are exercised without TPU hardware (the standard JAX
answer to multi-device testing; see SURVEY.md §4).

NOTE: this environment forces JAX_PLATFORMS=axon (remote TPU) and the axon
plugin ignores the env var, so the platform must be forced via jax.config
*before any device is touched* — env setdefault alone silently leaves tests
running on the real TPU through the tunnel (slow and non-hermetic)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: the 1-vCPU host pays ~20-60 s per big XLA
# compile; caching makes repeat test runs fast. XLA:CPU cache entries are
# AOT executables specialized to the compiling machine's ISA — /tmp can be
# shared across containers on different hosts here (observed: entries with
# mismatched CPU-feature sets triggering cpu_aot_loader SIGILL warnings),
# so key the directory by the host's CPU feature fingerprint.
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        _cpu = [ln for ln in f if ln.startswith("flags")][0]
except (OSError, IndexError):
    _cpu = platform.processor() or platform.machine()
_fp = hashlib.sha1(_cpu.encode()).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_tests_{_fp}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()
