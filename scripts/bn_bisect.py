"""Bisect the TPU-compiler crash triggered by non-default BN formulations.

Tries batch_pallas (and optionally batch_dot) at increasing model scales,
forward-only and train-step, printing OK/CRASH per case. Usage:

  python scripts/bn_bisect.py [batch_pallas]
"""

from __future__ import annotations

import sys

import numpy as np


def try_case(norm: str, size: int, batch: int, train: bool) -> str:
    import jax

    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model

    cfg = CNNModelConfig(
        image_size=(size, size), heatmap_size=size,
        normalization=norm,
    )
    model, variables = init_model(cfg, batch_size=batch)
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.uniform(size=(batch, size, size, 3)).astype(np.float32))
    dep = jax.device_put(
        rng.uniform(1, 8, size=(batch, size, size, 1)).astype(np.float32))
    kp = jax.device_put(
        rng.uniform(0.1, 0.9, size=(batch, 17, 2)).astype(np.float32))
    gt = jax.device_put(
        (rng.normal(size=(batch, 17, 3)) * 100).astype(np.float32))

    if not train:
        fwd = jax.jit(lambda v, a, b, c: model.apply(
            v, a, b, c, train=False))
        out = np.asarray(fwd(variables, img, dep, kp))
        return "OK" if np.isfinite(out).all() else "NONFINITE"

    def loss_fn(params, bstats):
        out, muts = model.apply(
            {"params": params, "batch_stats": bstats}, img, dep, kp,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return ((out - gt) ** 2).mean(), muts

    g = jax.jit(jax.grad(loss_fn, has_aux=True))
    grads, _ = g(variables["params"], variables["batch_stats"])
    leaf = jax.tree_util.tree_leaves(grads)[0]
    np.asarray(leaf)
    return "OK"


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    norm = sys.argv[1] if len(sys.argv) > 1 else "batch_pallas"
    cases = [
        (128, 10, False),
        (128, 10, True),
        (256, 10, True),
        (500, 10, False),
        (500, 10, True),
        (500, 100, True),
    ]
    for size, batch, train in cases:
        tag = f"{norm} size={size} B={batch} {'train' if train else 'fwd'}"
        try:
            r = try_case(norm, size, batch, train)
            print(f"{tag}: {r}", flush=True)
        except Exception as e:
            print(f"{tag}: CRASH {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
