"""Full-fidelity stage-1 throughput on the real chip.

Times the EXACT upstream architectures (random init — timing is
weight-independent): YOLO11x-pose at 640² and DepthPro (3× ViT-L,
35-patch pyramid) at 1536², bf16 compute. These bound the native
`preprocess`/`infer --stage1 jax` rates with ported weights.

  python scripts/stage1_bench.py [yolo|depth] ...
"""

from __future__ import annotations

import sys
import time

import numpy as np


def bench_yolo(batch: int = 8, reps: int = 5):
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.stage1.yolo11 import YOLO11Pose, best_person_keypoints

    model = YOLO11Pose(scale="x", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.uniform(size=(batch, 640, 640, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(v, x):
        kp, conf = best_person_keypoints(
            model.apply(v, x, train=False), 640)
        return kp, conf

    np.asarray(fwd(variables, x)[0])  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fwd(variables, x)[0])
    dt = (time.perf_counter() - t0) / reps
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(
        variables["params"]))
    print(f"yolo11x-pose @640 b{batch}: {dt * 1e3:.1f} ms/batch "
          f"({batch / dt:.1f} img/s, {n_params / 1e6:.1f}M params)",
          flush=True)


def bench_depth(batch: int = 2, reps: int = 3):
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.stage1.depthpro import (
        DepthProArch,
        DepthProDepthEstimator,
    )

    model = DepthProDepthEstimator(arch=DepthProArch(),
                                   dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(size=(batch, 1536, 1536, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(v, x):
        depth, fov = model.apply(v, x)
        return depth.mean(), fov

    np.asarray(fwd(variables, x)[0])  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fwd(variables, x)[0])
    dt = (time.perf_counter() - t0) / reps
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(
        variables["params"]))
    print(f"DepthPro @1536 b{batch}: {dt * 1e3:.1f} ms/batch "
          f"({batch / dt:.2f} img/s, {n_params / 1e6:.0f}M params)",
          flush=True)


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    which = sys.argv[1:] or ["yolo", "depth"]
    for w in which:
        try:
            if w == "yolo":
                bench_yolo()
            elif w == "depth":
                bench_depth()
        except Exception as e:
            print(f"{w}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
