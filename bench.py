"""Benchmark: full-size CNN lifter forward throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Method: K forward passes chained inside one jitted lax.scan with a single
device→host readback at the end. On this environment's remote-TPU tunnel,
per-call dispatch+readback costs ~30 ms and block_until_ready does not
actually synchronize, so chaining is the only way to measure device time
(see .claude/skills/verify/SKILL.md gotchas).

vs_baseline: the reference publishes no throughput (SURVEY.md §6); its
training sustains ~3-10 img/s effective on an unnamed GPU (report.pdf §5.1:
8,700 steps × 100 images per epoch, 1-3 days/model). The BASELINE.json
north star asks for ≥5× a PyTorch-CPU bar; we report value/10 against a
conservative 10 img/s CPU-reference bar.
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
    B, K = 10, 20
    model, variables = init_model(cfg, batch_size=B)

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.uniform(size=(B, 500, 500, 3)).astype(np.float32))
    dep = jax.device_put(
        rng.uniform(1, 8, size=(B, 500, 500, 1)).astype(np.float32)
    )
    kp = jax.device_put(
        rng.uniform(0.1, 0.9, size=(B, 17, 2)).astype(np.float32)
    )

    @jax.jit
    def chain(v, a, b, c):
        def body(carry, _):
            out = model.apply(v, a + carry * 1e-9, b, c, train=False)
            return out.sum(), None

        s, _ = jax.lax.scan(body, jax.numpy.float32(0), None, length=K)
        return s

    np.asarray(chain(variables, img, dep, kp))  # compile + warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(chain(variables, img, dep, kp))
    per_fwd = (time.perf_counter() - t0) / (reps * K)
    imgs_per_sec = B / per_fwd

    baseline_cpu_imgs_per_sec = 10.0
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
