"""BN formulation timing experiment (real TPU).

Round-1 measured flax BatchNorm stat reduces at ~21% of train-step wall
(identity-norm control: 307 vs 388 ms at B=100). This script times the
full-size CNN train step at B=100 for each normalization option so the
winner can become the default. Usage:

  python scripts/bn_timing.py [batch | batch_dot | identity] ...

Prints ms/step per variant (steady state after layout recompiles).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def time_variant(norm: str, B: int = 100, reps: int = 5) -> float:
    import jax

    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state, make_train_step

    cfg = CNNModelConfig(normalization=norm)
    model, variables = init_model(cfg, batch_size=B)
    state = create_train_state(model, variables)
    step = make_train_step(model, donate=True)

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.uniform(size=(1, B, 500, 500, 3)).astype(np.float32)),
        "depth": jax.device_put(
            rng.uniform(1, 8, size=(1, B, 500, 500, 1)).astype(np.float32)),
        "keypoints_2d": jax.device_put(
            rng.uniform(0.1, 0.9, size=(1, B, 17, 2)).astype(np.float32)),
        "joints_3d": jax.device_put(
            (rng.normal(size=(1, B, 17, 3)) * 100).astype(np.float32)),
    }
    key = jax.device_put(jax.random.PRNGKey(0))

    def run(k):
        nonlocal state
        m = None
        for _ in range(k):
            state, m = step(state, batch, key)
        return float(np.asarray(m["total_loss"]))

    run(3)  # compile + layout recompiles
    t0 = time.perf_counter()
    loss = run(reps)
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(loss)
    return dt * 1e3


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    variants = sys.argv[1:] or ["batch", "batch_dot", "identity"]
    for norm in variants:
        try:
            ms = time_variant(norm)
            print(f"{norm:12s}: {ms:8.1f} ms/step (B=100)", flush=True)
        except Exception as e:  # compiler crashes are data, not failures
            print(f"{norm:12s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
