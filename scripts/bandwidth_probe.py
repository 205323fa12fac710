"""Effective-HBM-bandwidth probe for the current device (docs/ROUND3.md).

Chains K elementwise passes over a device-resident buffer inside ONE
jitted program (scan) and clocks with a readback — the only honest timing
on the remote-TPU tunnel. NOTE the caveat from docs/ROUND3.md: this
number mixes per-op overhead with true DMA bandwidth; matmul-dominated
streams achieve more. Round-3 measurements on the axon-virtualized v5e:
12.6 MB → 33 GB/s, 100 MB → 52 GB/s (production v5e: ~819 GB/s).

  python scripts/bandwidth_probe.py
"""

from __future__ import annotations

import time

import numpy as np


def probe(shape, iters: int, reps: int = 3):
    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.ones(shape, jnp.bfloat16))

    @jax.jit
    def chain(x):
        def body(c, _):
            return c * 1.000001 + 0.0, None  # one read + one write of c

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    np.asarray(chain(x)[0, 0])  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(chain(x)[0, 0])
    dt = (time.perf_counter() - t0) / (reps * iters)
    nbytes = x.size * x.dtype.itemsize * 2
    mb = x.size * x.dtype.itemsize / 1e6
    print(f"{mb:7.1f} MB elementwise: {dt * 1e6:8.1f} us/pass "
          f"-> {nbytes / dt / 1e9:6.0f} GB/s effective", flush=True)


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    except Exception:
        pass
    print("device:", jax.devices()[0], flush=True)
    probe((8 * 1025, 768), iters=50)       # the ViT activation working set
    probe((65536, 768), iters=10)          # ~100 MB
    # Larger sets take minutes at tens of GB/s — keep the probe bounded.


if __name__ == "__main__":
    main()
