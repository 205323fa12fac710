"""Benchmark: framework perf surface on the real chip, ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Primary metric: effective images/sec of one optimizer step at the
reference's exact training configuration — batch 10 × grad-accum 10
(/root/reference/src/config.py:7-8), full 500×500 21-channel CNN — i.e.
the workload that dominates the reference's 1–3 day training runs. Since
round 3 the step uses grouped ghost-BatchNorm accumulation (train/step.py
accum_mode="grouped"): one flat batch-100 XLA program whose BatchNorm
statistics are computed per group of 10 inside each BatchNorm call
(train/ghost_bn.py interceptor), proven equivalent to the sequential
accumulation loop by tests/test_ghost_accum.py. Chip A/B: grouped 278.1,
ghost (vmapped) 257.4, scan 161, 100×1 control 281.6 img/s.

Method: the train step consumes the whole [A=10, B=10, ...] superbatch in
one jitted program. K steps are chained through the donated train state
with a single device→host readback at the end. On this environment's
remote-TPU tunnel, per-call dispatch costs ~30 ms and block_until_ready
does not actually synchronize, so the trailing readback is the only honest
clock (CLAUDE.md gotchas).

vs_baseline basis (BASELINE.md): the reference publishes no images/sec.
Its documented training scale is ~870,000 images per epoch (8,700
optimizer steps × effective batch 100, report.pdf §5.1 footnote 2) at
1–3 days per model. Crediting the reference GPU with the most generous
reading — one full epoch per day — gives 870,000 / 86,400 s ≈ 10.07
images/sec. vs_baseline = value / 10.07.

Secondary metrics in "extra" (VERDICT.md round-2 item 7 — the full perf
surface in one record): the sequential-scan accumulation variant (the
round-2 headline path, for continuity), batch 100×1, forward-only b10,
the ViT-B train step (Pallas attention), and the stage-1 YOLO11x-pose /
DepthPro full-topology sweeps.

Deliverability (VERDICT.md round-3 item 1 — round 3's record was lost to
a driver timeout, rc=124): the primary metric is printed, flushed, the
moment it is measured; extras then run under an internal wall-clock
budget (POSE3D_BENCH_BUDGET seconds, default 600 — the round-3 kill
landed somewhere in the 10-25 min window, so the stock run must clear
rc=0 well inside 10 minutes; raise the env var for the full surface).
Each extra has a
cost estimate and is only STARTED if it fits the remaining budget —
skipped extras record "SKIPPED (budget)" — so an external kill never
lands mid-TPU-compile (the remote-wedge risk, CLAUDE.md). The full
record is printed again as the final line; a driver that takes the last
parseable JSON line gets the full record on success and the primary-only
record on a timeout. The two heaviest programs (DepthPro 951 M @1536²,
the two augmented train variants) are opt-in via POSE3D_BENCH_FULL=1.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 870_000 / 86_400  # ≈10.07, see module docstring


def _device_batch(accum: int, batch: int, size: int = 500, joints: int = 17):
    import jax

    rng = np.random.default_rng(0)
    shape2 = (accum, batch) if accum else (batch,)
    batch_np = {
        "image": rng.uniform(size=shape2 + (size, size, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=shape2 + (size, size, 1)).astype(
            np.float32
        ),
        "keypoints_2d": rng.uniform(
            0.1, 0.9, size=shape2 + (joints, 2)
        ).astype(np.float32),
        "joints_3d": (rng.normal(size=shape2 + (joints, 3)) * 100).astype(
            np.float32
        ),
    }
    return {k: jax.device_put(v) for k, v in batch_np.items()}


def bench_train(model, variables, accum: int, batch: int,
                warmup: int = 3, reps: int = 5,
                accum_mode: str = "grouped", size: int = 500,
                augment=None) -> float:
    """Images/sec of the full train step (fwd+bwd+accum+optimizer)."""
    import jax

    from pose3d_tpu.train import create_train_state, make_train_step

    # fresh on-device copy: the step donates the state, which would
    # otherwise delete the caller's `variables` buffers
    variables = jax.tree_util.tree_map(
        lambda x: jax.numpy.array(x, copy=True), variables
    )
    state = create_train_state(model, variables)
    step = make_train_step(model, donate=True, accum_mode=accum_mode,
                           augment=augment)
    superbatch = _device_batch(accum, batch, size=size)
    key = jax.device_put(jax.random.PRNGKey(0))

    def run(k):
        nonlocal state
        m = None
        for _ in range(k):
            state, m = step(state, superbatch, key)
        return float(np.asarray(m["total_loss"]))  # sync point

    run(warmup)  # compile + the first layout-keyed recompiles
    t0 = time.perf_counter()
    loss = run(reps)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"non-finite training loss {loss}"
    return accum * batch * reps / dt


def bench_train_augmented(model, variables, rotation: bool = False) -> float:
    """Train step with in-jit device augmentation. rotation=False is the
    CLI's --augment-device profile (flip/scale/translate/color as MXU
    interpolation matmuls); rotation=True adds the two-pass Mosaic
    lane-resample warp (ops/pallas/lane_resample.py — 381 ms/step vs
    364 separable vs 359 unaugmented, measured round 3)."""
    from pose3d_tpu.ops.augment_device import (
        DeviceAugmentConfig,
        make_device_augment,
    )

    return bench_train(
        model, variables, accum=10, batch=10,
        augment=make_device_augment(
            DeviceAugmentConfig(enable_rotation=rotation)
        ),
    )


def bench_forward(model, variables, batch: int = 10, k: int = 20,
                  reps: int = 3) -> float:
    """Forward-only images/sec via K passes chained inside one scan."""
    import jax

    b = _device_batch(0, batch)

    @jax.jit
    def chain(v, img, dep, kp):
        def body(carry, _):
            out = model.apply(v, img + carry * 1e-9, dep, kp, train=False)
            return out.sum(), None

        s, _ = jax.lax.scan(body, jax.numpy.float32(0), None, length=k)
        return s

    args = (variables, b["image"], b["depth"], b["keypoints_2d"])
    np.asarray(chain(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(chain(*args))
    return batch * reps * k / (time.perf_counter() - t0)


def bench_vit_train(batch: int = 8, warmup: int = 3, reps: int = 5) -> float:
    """ViT-B lifter train-step latency (ms) at batch 8, Pallas attention."""
    from pose3d_tpu.core.config import TransformerModelConfig
    from pose3d_tpu.models import init_model

    cfg = TransformerModelConfig()  # 512×512, ViT-B/16, fusion + final enc
    model, variables = init_model(cfg, batch_size=batch)
    imgs_per_sec = bench_train(
        model, variables, accum=1, batch=batch,
        warmup=warmup, reps=reps, size=cfg.image_size[0],
    )
    return batch / imgs_per_sec * 1e3  # ms/step


def bench_yolo(batch: int = 8, reps: int = 5) -> float:
    """YOLO11x-pose full-topology forward+decode images/sec @640."""
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
        return best_person_keypoints(model.apply(v, x, train=False), 640)

    np.asarray(fwd(variables, x)[0])  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fwd(variables, x)[0])
    return batch * reps / (time.perf_counter() - t0)


def bench_depthpro(batch: int = 2, reps: int = 3) -> float:
    """DepthPro full-topology (3×ViT-L) forward images/sec @1536."""
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.stage1.depthpro import DepthProArch, DepthProDepthEstimator

    model = DepthProDepthEstimator(arch=DepthProArch(), dtype=jnp.bfloat16)
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
    return batch * reps / (time.perf_counter() - t0)


def _record(value: float, extra: dict) -> dict:
    return {
        "metric": "cnn_train_step_images_per_sec_eff_batch_100",
        "value": round(value, 2),
        "unit": "images/sec",
        "vs_baseline": round(value / BASELINE_IMGS_PER_SEC, 2),
        "extra": extra,
    }


def main():
    import os
    import sys

    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()

    # Persistent compile cache: repeat bench runs skip the ~40 s per-program
    # TPU compiles (harmless if the backend declines to cache).
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("POSE3D_COMPILE_CACHE", "/tmp/jax_cache_tpu"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    budget = float(os.environ.get("POSE3D_BENCH_BUDGET", "600"))
    full = os.environ.get("POSE3D_BENCH_FULL", "") == "1"
    t_start = time.perf_counter()

    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model

    cfg = CNNModelConfig()  # flagship: 500×500, 21-channel input
    model, variables = init_model(cfg, batch_size=10)

    train_ref = bench_train(model, variables, accum=10, batch=10)

    # Flush the primary record NOW — if the driver's timeout lands during
    # the extras, the last parseable stdout line is still a full record.
    print(json.dumps(_record(train_ref, {"partial": True})), flush=True)

    # (name, cost-estimate seconds, fn). Estimates are deliberately
    # generous for this environment: each new XLA program costs ~40 s of
    # remote compile plus the timed reps; DepthPro adds a 951 M-param init.
    extras_plan = [
        ("forward_b10_images_per_sec", 60,
         lambda: bench_forward(model, variables, batch=10)),
        ("train_step_b100x1_images_per_sec", 150,
         lambda: bench_train(model, variables, accum=1, batch=100)),
        ("train_step_ghost_10x10_images_per_sec", 150,
         lambda: bench_train(model, variables, accum=10, batch=10,
                             accum_mode="ghost")),
        ("train_step_scan_10x10_images_per_sec", 180,
         lambda: bench_train(model, variables, accum=10, batch=10,
                             accum_mode="scan", reps=3)),
        ("vit_train_step_b8_ms", 240, bench_vit_train),
        ("yolo11x_pose_640_b8_images_per_sec", 180, bench_yolo),
    ]
    if full:  # heaviest programs are opt-in (POSE3D_BENCH_FULL=1)
        extras_plan += [
            ("train_step_augmented_images_per_sec", 180,
             lambda: bench_train_augmented(model, variables)),
            ("train_step_augmented_rotation_images_per_sec", 200,
             lambda: bench_train_augmented(model, variables, rotation=True)),
            ("depthpro_1536_b2_images_per_sec", 420, bench_depthpro),
        ]

    extra = {}
    for name, est, fn in extras_plan:
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < est:
            # Never START a program that can't finish inside the budget:
            # an external kill mid-TPU-compile can wedge the remote chip
            # for 30-75 min (CLAUDE.md).
            extra[name] = "SKIPPED (budget)"
            continue
        try:
            extra[name] = round(fn(), 2)
        except Exception as e:  # record, don't sink the primary metric
            extra[name] = f"FAILED {type(e).__name__}: {str(e)[:120]}"
    if not full:
        extra["opt_in_note"] = (
            "augmented-train + DepthPro@1536 extras require "
            "POSE3D_BENCH_FULL=1 (round-3 numbers in README)"
        )
    extra["baseline_basis"] = (
        "reference: 870k imgs/epoch at best 1 day/epoch "
        "= 10.07 img/s (BASELINE.md)"
    )
    extra["elapsed_s"] = round(time.perf_counter() - t_start, 1)

    sys.stdout.flush()
    print(json.dumps(_record(train_ref, extra)), flush=True)


if __name__ == "__main__":
    main()
