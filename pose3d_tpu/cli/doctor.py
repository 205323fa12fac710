"""pose3d-doctor — environment and installation diagnostics.

The reference has no equivalent (its failure mode is a stack trace five
imports deep); this prints one screen answering the questions that every
support thread starts with: which accelerator is visible, is the native
host tier built, where is the compile cache, are the console scripts
installed — plus optional quick probes of device matmul throughput, host
decode, and host→device transfer (``--probe``).

Usage:
  pose3d-doctor [--probe] [--json out.json]
"""

from __future__ import annotations

import argparse
import importlib
import json
import logging
import platform
import shutil
import sys
import time
from typing import Dict

logger = logging.getLogger("Doctor")

_VERSION_MODULES = (
    "jax", "jaxlib", "flax", "optax", "orbax.checkpoint", "numpy", "cv2",
    "torch",
)


def _versions() -> Dict[str, str]:
    out = {"python": platform.python_version()}
    for name in _VERSION_MODULES:
        try:
            mod = importlib.import_module(name)
            out[name] = str(getattr(mod, "__version__", "unknown"))
        except Exception:
            out[name] = "NOT INSTALLED"
    return out


def _devices() -> Dict:
    import jax

    devs = jax.devices()
    return {
        "default_backend": jax.default_backend(),
        "device_count": len(devs),
        "devices": sorted({d.device_kind for d in devs}),
        "platforms": sorted({d.platform for d in devs}),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }


def _native() -> Dict:
    from pose3d_tpu.data import native

    lib = native.get_lib()
    info = {
        "decoder_available": lib is not None,
        "chunkio_available": native.chunkio_available(),
    }
    if lib is not None:
        try:
            lib.pd_version.restype = __import__("ctypes").c_char_p
            info["version"] = lib.pd_version().decode()
        except Exception:
            info["version"] = "unknown"
    return info


def _install() -> Dict:
    import pose3d_tpu

    # Derive the expected console scripts from the installed metadata —
    # a hand-maintained list drifts from pyproject [project.scripts]
    # (it already had) and misses exactly the broken-install failures
    # this check exists to catch.
    try:
        from importlib.metadata import entry_points

        scripts = sorted(
            ep.name for ep in entry_points(group="console_scripts")
            if ep.value.startswith("pose3d_tpu.")
        )
    except Exception:
        scripts = []
    if not scripts:  # metadata unavailable (e.g. no dist-info at all)
        scripts = ["pose3d-train", "pose3d-infer", "pose3d-eval",
                   "pose3d-preprocess", "pose3d-chunker",
                   "pose3d-rechunker", "pose3d-split", "pose3d-convert",
                   "pose3d-export", "pose3d-serve", "pose3d-doctor"]
    return {
        "package_path": str(pose3d_tpu.__file__),
        "console_scripts_expected": len(scripts),
        "console_scripts_missing": [
            s for s in scripts if shutil.which(s) is None
        ],
    }


def _config() -> Dict:
    import jax

    cache = None
    try:
        cache = jax.config.jax_compilation_cache_dir
    except Exception:
        pass
    return {"compilation_cache_dir": cache}


def _probe() -> Dict:
    """Quick order-of-magnitude probes. Timing forces a device→host
    readback per iteration — on the tunneled axon TPU,
    ``block_until_ready`` does not actually wait (CLAUDE.md gotcha)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    out: Dict = {}

    # device matmul throughput (bf16 on the MXU). The scan chain is long
    # enough (64 × 4096³ ≈ 8.8 TFLOP/call) that the ~30 ms per-dispatch
    # tunnel overhead is noise, and the scalar readback per call is the
    # only honest sync on this platform.
    n, length, iters = 4096, 64, 2
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).normal(size=(n, n)),
                    jnp.bfloat16)
    )

    @jax.jit
    def chain(a):
        def body(c, _):
            c = a @ c
            return c * jnp.bfloat16(1e-3), None
        c, _ = jax.lax.scan(body, a, None, length=length)
        return c.astype(jnp.float32).sum()

    float(chain(x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chain(x))  # scalar readback = honest sync
    dt = (time.perf_counter() - t0) / iters
    out["matmul_tflops"] = length * 2 * n**3 / dt / 1e12

    # host→device transfer (readback of a reduction confirms arrival)
    buf = np.random.default_rng(1).random((4, 1024, 1024), np.float32)
    t0 = time.perf_counter()
    dev = jax.device_put(buf)
    float(jnp.sum(dev))
    out["host_to_device_MBps"] = buf.nbytes / 1e6 / (
        time.perf_counter() - t0
    )

    # host decode (native or cv2 fallback)
    import cv2

    from pose3d_tpu.data import native as native_mod

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(500, 500, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    blobs = [enc.tobytes()] * 32
    t0 = time.perf_counter()
    native_mod.decode_jpeg_batch(blobs, (500, 500), num_threads=8)
    out["host_decode_imgs_per_sec"] = len(blobs) / (
        time.perf_counter() - t0
    )
    return out


def main(argv=None) -> Dict:
    parser = argparse.ArgumentParser(
        "pose3d-doctor", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--probe", action="store_true",
                        help="Run quick device/host performance probes "
                             "(compiles a small program; ~10-60 s on a "
                             "cold cache)")
    parser.add_argument("--json", type=str, default=None,
                        help="Also write the report as JSON")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()

    report: Dict = {"versions": _versions()}
    try:
        report["devices"] = _devices()
    except Exception as e:  # no backend at all — still print the rest
        report["devices"] = {"error": str(e)}
    report["native"] = _native()
    report["install"] = _install()
    report["config"] = _config()
    if args.probe:
        report["probe"] = _probe()

    for section, values in report.items():
        logger.info("%s:", section)
        for k, v in values.items():
            logger.info("  %-24s %s", k, v)

    warnings = []
    if not report["native"]["decoder_available"]:
        warnings.append("native decoder not built (make -C native) — "
                        "falling back to per-image cv2 decode")
    if report["install"]["console_scripts_missing"]:
        warnings.append(
            "console scripts missing (%s) — re-run `pip install -e . "
            "--no-build-isolation`"
            % ", ".join(report["install"]["console_scripts_missing"])
        )
    dev = report["devices"]
    if isinstance(dev.get("device_count"), int) and dev["device_count"] == 0:
        warnings.append("no accelerator devices visible")
    for w in warnings:
        logger.warning("WARNING: %s", w)
    report["warnings"] = warnings

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2, default=str)
    return report


def cli(argv=None) -> int:
    """Console-script entry: diagnostics are informational — exit 0 unless
    the report itself could not be produced."""
    main(argv)
    return 0


if __name__ == "__main__":
    sys.exit(cli())
