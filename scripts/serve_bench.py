"""Serving-artifact latency on the real chip: exported StableHLO vs the
live jitted model, flagship CNN at 500x500.

Usage:  python scripts/serve_bench.py [batch]

Times via trailing readback (block_until_ready does not wait through the
axon tunnel — CLAUDE.md gotcha); K calls chained by feeding the previous
output's first element back into the input epsilon so the dispatch queue
cannot collapse the chain.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(batch: int = 10, k: int = 20, reps: int = 3) -> None:
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model
    from pose3d_tpu.serve import export_lifter, make_serving_fn

    cfg = CNNModelConfig()
    model, variables = init_model(cfg, batch_size=batch)
    rng = np.random.default_rng(0)
    h, w = cfg.image_size
    img = jax.device_put(
        rng.uniform(size=(batch, h, w, 3)).astype(np.float32))
    dep = jax.device_put(
        rng.uniform(1, 8, size=(batch, h, w, 1)).astype(np.float32))
    kp = jax.device_put(
        rng.uniform(0.1, 0.9, size=(batch, 17, 2)).astype(np.float32))

    def timed(call, label):
        out = call(img, dep, kp)
        np.asarray(out)  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                # each call consumes the previous output (×0, so the
                # numerics are unchanged) — the dispatch queue cannot
                # collapse or overlap the chain
                eps = o[0, 0, 0] * 0 if o is not None else 0.0
                o = call(img + eps, dep, kp)
            np.asarray(o)  # single trailing readback
            best = min(best, (time.perf_counter() - t0) / k)
        print(f"{label}: {best * 1e3:.2f} ms/call "
              f"({batch / best:.1f} img/s)", flush=True)
        return best

    jit_fn = jax.jit(make_serving_fn(model, variables))
    t_jit = timed(jit_fn, f"live jit b{batch}")

    exported = export_lifter(model, variables, (h, w), batch_size=batch)
    blob = exported.serialize()
    print(f"artifact: {len(blob) / 1e6:.1f} MB serialized", flush=True)
    from jax import export as jexport

    art = jexport.deserialize(blob)
    t_art = timed(art.call, f"exported artifact b{batch}")
    print(f"overhead: {(t_art / t_jit - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
