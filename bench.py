"""Benchmark: end-to-end lifting-model throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measured quantity: full-size CNN lifter forward images/sec at batch 10
(the reference's batch size, config.py:7) with device-resident inputs.
``vs_baseline``: the reference publishes no throughput (SURVEY.md §6), so
the baseline is the measured PyTorch-CPU-equivalent ~2 img/s order
(BASELINE.json north star: ≥5× PyTorch-CPU); we report value/10 as a
conservative ratio vs a 10 img/s CPU reference bar.

NOTE (axon tunnel): block_until_ready does not truly synchronize, so each
iteration forces a device→host readback of the (small) output.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    import jax

    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model

    cfg = CNNModelConfig()
    B = 10
    model, variables = init_model(cfg, batch_size=B)

    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.uniform(size=(B, 500, 500, 3)).astype(np.float32)
    )
    dep = jax.device_put(
        rng.uniform(1, 8, size=(B, 500, 500, 1)).astype(np.float32)
    )
    kp = jax.device_put(
        rng.uniform(0.1, 0.9, size=(B, 17, 2)).astype(np.float32)
    )

    fwd = jax.jit(lambda v, a, b, c: model.apply(v, a, b, c, train=False))
    np.asarray(fwd(variables, img, dep, kp))  # compile + warmup

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fwd(variables, img, dep, kp))
    dt = (time.perf_counter() - t0) / iters
    imgs_per_sec = B / dt

    baseline_cpu_imgs_per_sec = 10.0  # conservative torch-CPU bar
    print(
        json.dumps(
            {
                "metric": "cnn_lifter_forward_images_per_sec",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(
                    imgs_per_sec / baseline_cpu_imgs_per_sec, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
