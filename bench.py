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

# MFU denominators (VERDICT round-4 item 1): v5e nameplate bf16 peak and
# the measured ceiling of THIS axon-virtualized chip (pose3d-doctor
# --probe: 116.5 TFLOP/s sustained on a scan-chained 4096³ bf16 matmul —
# 59% of nameplate; the virtualization layer never reaches 197).
PEAK_BF16_TFLOPS = 197.0
MEASURED_CEILING_TFLOPS = 116.5


def _program_flops(jitted, *args) -> float | None:
    """FLOPs of the compiled program per XLA's cost model, via the AOT
    path (works on the axon backend — same route as --memory-report).
    Called AFTER the timed run so the persistent compile cache serves the
    second compile in seconds. Returns None when the backend declines."""
    import jax

    try:
        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args
        )
        ca = jitted.lower(*shapes).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca["flops"])
        return f if f > 0 else None
    except Exception:
        return None


def _mfu_fields(flops: float | None, steps_per_sec: float, extra: dict,
                prefix: str) -> None:
    """Attach flops/TFLOP/s/MFU numbers for one measured program."""
    if flops is None:
        extra[f"{prefix}_mfu"] = "UNAVAILABLE (cost_analysis)"
        return
    tflops = flops * steps_per_sec / 1e12
    extra[f"{prefix}_flops_per_step"] = float(f"{flops:.4g}")
    extra[f"{prefix}_tflops_per_sec"] = round(tflops, 2)
    extra[f"{prefix}_mfu_vs_peak"] = round(tflops / PEAK_BF16_TFLOPS, 4)
    extra[f"{prefix}_mfu_vs_measured_ceiling"] = round(
        tflops / MEASURED_CEILING_TFLOPS, 4
    )


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
                augment=None, flops_out: dict | None = None) -> float:
    """Images/sec of the full train step (fwd+bwd+accum+optimizer).

    ``flops_out``: pass a dict to additionally receive
    ``{"flops": <per-step FLOPs>}`` from the compiled program's XLA cost
    model (one extra AOT compile — served by the persistent cache)."""
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
    if flops_out is not None:
        flops_out["flops"] = _program_flops(step, state, superbatch, key)
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
                  reps: int = 3, flops_out: dict | None = None) -> float:
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
    if flops_out is not None:
        f = _program_flops(chain, *args)
        # the chain is k forward passes; report per single forward step
        flops_out["flops"] = f / k if f else None
    return batch * reps * k / (time.perf_counter() - t0)


def bench_vit_train(batch: int = 8, warmup: int = 3, reps: int = 5,
                    flops_out: dict | None = None) -> float:
    """ViT-B lifter train-step latency (ms) at batch 8, Pallas attention."""
    from pose3d_tpu.core.config import TransformerModelConfig
    from pose3d_tpu.models import init_model

    cfg = TransformerModelConfig()  # 512×512, ViT-B/16, fusion + final enc
    model, variables = init_model(cfg, batch_size=batch)
    imgs_per_sec = bench_train(
        model, variables, accum=1, batch=batch,
        warmup=warmup, reps=reps, size=cfg.image_size[0],
        flops_out=flops_out,
    )
    return batch / imgs_per_sec * 1e3  # ms/step


def bench_yolo(batch: int = 8, reps: int = 5,
               flops_out: dict | None = None) -> float:
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
    if flops_out is not None:
        flops_out["flops"] = _program_flops(fwd, variables, x)
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


def bench_host_pipeline(n: int = 64, size: int = 500) -> dict:
    """Host-side input pipeline alone (no TPU): synthetic 500×500 chunk →
    decode_chunk_samples (native GIL-free batched decode, uint8 path) →
    collate_fixed, images/sec, with a decode-thread sweep to show the
    scaling slope the 1-vCPU dev box can't realize (VERDICT round-4
    item 6 — the 280 img/s device step vs 123 img/s host decode gap
    belongs in the driver record, not README prose)."""
    import json as _json
    import pickle
    import tempfile
    from pathlib import Path

    import cv2

    from pose3d_tpu.data.chunks import decode_chunk_samples
    from pose3d_tpu.data.collate import collate_fixed

    rng = np.random.default_rng(0)
    out: dict = {}
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        samples = []
        for i in range(n):
            sdir = root / "data" / f"{i:06d}"
            sdir.mkdir(parents=True)
            img = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            cv2.imwrite(str(sdir / "image.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            cv2.imwrite(str(sdir / "depth.png"),
                        rng.integers(0, 255, size=(size, size), dtype=np.uint8))
            kpts = rng.uniform(2, size - 2, size=(17, 2))
            (sdir / "metadata.json").write_text(_json.dumps({
                "image_size": [size, size], "depth_size": [size, size],
                "keypoints": [[{"x": float(x), "y": float(y)}
                               for x, y in kpts]],
                "depth_min": 1.5, "depth_max": 7.5,
            }))
            joints = rng.normal(size=(17, 3)) * 200
            joints[:, 2] += 5000
            samples.append({
                "image_file": f"data/{i:06d}/image.jpg",
                "depth_file": f"data/{i:06d}/depth.png",
                "metadata_file": f"data/{i:06d}/metadata.json",
                "joints_3d": joints.tolist(),
                "depth_min": 1.5, "depth_max": 7.5,
            })
        with open(root / "samples.pkl", "wb") as f:
            pickle.dump(samples, f)

        for threads in (1, 2, 4, 8):
            t0 = time.perf_counter()
            decoded = decode_chunk_samples(
                samples, root, image_size=(size, size),
                num_threads=threads, pixel_dtype="uint8",
            )
            dt = time.perf_counter() - t0
            out[f"decode_imgs_per_sec_t{threads}"] = round(n / dt, 1)
        t0 = time.perf_counter()
        batch = collate_fixed(decoded, image_size=(size, size))
        out["collate_imgs_per_sec"] = round(
            n / (time.perf_counter() - t0), 1
        )
        assert batch["image"].shape[0] == n
    return out


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
    # ^ also enables the persistent compile cache at
    # ~/.cache/pose3d_tpu/jax_cache (POSE3D_COMPILE_CACHE overrides).
    # /root persists across driver rounds while /tmp does NOT — round 4's
    # driver run paid ~570 s of cold compiles against a fresh /tmp cache
    # dir; a verified cross-process cache hit on the axon backend cuts a
    # first-call compile from 85.5 s to 1.1 s (round-5 measurement).

    budget = float(os.environ.get("POSE3D_BENCH_BUDGET", "600"))
    full = os.environ.get("POSE3D_BENCH_FULL", "") == "1"
    t_start = time.perf_counter()

    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model

    cfg = CNNModelConfig()  # flagship: 500×500, 21-channel input
    model, variables = init_model(cfg, batch_size=10)

    fl: dict = {}
    train_ref = bench_train(model, variables, accum=10, batch=10,
                            flops_out=fl)

    # Flush the primary record NOW — if the driver's timeout lands during
    # the extras, the last parseable stdout line is still a full record.
    print(json.dumps(_record(train_ref, {"partial": True})), flush=True)

    extra = {}
    # steps/sec of the 100-image step = imgs_per_sec / 100
    _mfu_fields(fl.get("flops"), train_ref / 100.0, extra, "cnn_train")

    # (name, cost-estimate seconds, fn, flops-postproc). Estimates are the
    # WARM-persistent-cache costs measured in the round-5 dress rehearsal
    # (per-extra `_t_*` fields in BENCH_r05 / docs/ROUND5.md) plus ~50%
    # headroom — the driver's run starts against the cache this session
    # pre-warmed at ~/.cache/pose3d_tpu/jax_cache (/root persists across
    # rounds; /tmp does not — the round-4 cold-run lesson). Ordered so the
    # MFU-carrying programs (ViT, YOLO) run before the accumulation-variant
    # continuity numbers: under a tight budget the trailing variants are
    # the right things to lose.
    def _train_variant(**kw):
        def run():
            return bench_train(model, variables, **kw)
        return run

    extras_plan = [
        ("forward_b10_images_per_sec", 15,
         lambda: bench_forward(model, variables, batch=10)),
        ("host_pipeline", 15, bench_host_pipeline),
        ("vit_train_step_b8_ms", 170, None),  # handled below (MFU)
        ("yolo11x_pose_640_b8_images_per_sec", 45, None),
        ("train_step_b100x1_images_per_sec", 70,
         _train_variant(accum=1, batch=100)),
        ("train_step_ghost_10x10_images_per_sec", 75,
         _train_variant(accum=10, batch=10, accum_mode="ghost")),
        ("train_step_scan_10x10_images_per_sec", 100,
         _train_variant(accum=10, batch=10, accum_mode="scan", reps=3)),
    ]
    if full:  # heaviest programs are opt-in (POSE3D_BENCH_FULL=1)
        extras_plan += [
            ("train_step_augmented_images_per_sec", 180,
             lambda: bench_train_augmented(model, variables)),
            ("train_step_augmented_rotation_images_per_sec", 200,
             lambda: bench_train_augmented(model, variables, rotation=True)),
            ("depthpro_1536_b2_images_per_sec", 420, bench_depthpro),
        ]

    for name, est, fn in extras_plan:
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < est:
            # Never START a program that can't finish inside the budget:
            # an external kill mid-TPU-compile can wedge the remote chip
            # for 30-75 min (CLAUDE.md).
            extra[name] = "SKIPPED (budget)"
            continue
        t_extra = time.perf_counter()
        try:
            if name == "vit_train_step_b8_ms":
                fo: dict = {}
                ms = bench_vit_train(flops_out=fo)
                extra[name] = round(ms, 2)
                _mfu_fields(fo.get("flops"), 1e3 / ms, extra, "vit_train")
            elif name == "yolo11x_pose_640_b8_images_per_sec":
                fo = {}
                rate = bench_yolo(flops_out=fo)
                extra[name] = round(rate, 2)
                _mfu_fields(fo.get("flops"), rate / 8.0, extra, "yolo11x")
            elif name == "host_pipeline":
                extra.update(
                    {f"host_{k}": v for k, v in bench_host_pipeline().items()}
                )
            else:
                extra[name] = round(fn(), 2)
        except Exception as e:  # record, don't sink the primary metric
            extra[name] = f"FAILED {type(e).__name__}: {str(e)[:120]}"
        extra[f"_t_{name}"] = round(time.perf_counter() - t_extra, 1)
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
