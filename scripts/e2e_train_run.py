"""End-to-end CLI training run on synthetic learnable data (real TPU).

Builds full-size 500×500 chunks whose 3D joints are a fixed linear map of
the 2D keypoints (learnable signal), then drives the ACTUAL train CLI twice
with a shared XLA compilation cache — a short warm-up run to populate the
cache, then a timed run whose wall-clock approximates steady state. This
is the honest end-to-end figure (host pipeline + tunnel transfer +
device), complementing bench.py's device-side number.

  python scripts/e2e_train_run.py [--steps 30] [--samples 180] [--chunks 3]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import tarfile
import tempfile
import time
from pathlib import Path

import cv2
import numpy as np


def make_learnable_chunk(out_dir: Path, chunk_idx: int, num_samples: int,
                         size: int, w_map: np.ndarray, prefix: str):
    rng = np.random.default_rng(100 + chunk_idx)
    chunk_name = f"chunk_{chunk_idx:06d}"
    stage = out_dir / "_stage" / chunk_name
    data_dir = stage / "data"
    samples = []
    for i in range(num_samples):
        sdir = data_dir / f"{i:06d}"
        sdir.mkdir(parents=True, exist_ok=True)
        img = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        cv2.imwrite(str(sdir / "image.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        cv2.imwrite(str(sdir / "depth.png"),
                    rng.integers(0, 255, size=(size, size), dtype=np.uint8))
        kpts = rng.uniform(5, size - 5, size=(17, 2))
        norm = kpts / size
        # joints = W · [x, y, 1] per joint — exactly learnable from kpts
        joints = np.einsum("jab,jb->ja", w_map,
                           np.concatenate([norm, np.ones((17, 1))], 1))
        metadata = {
            "image_size": [size, size], "depth_size": [size, size],
            "keypoints": [[{"x": float(x), "y": float(y)}
                           for x, y in kpts]],
            "depth_min": 1.5, "depth_max": 7.5,
        }
        with open(sdir / "metadata.json", "w") as f:
            json.dump(metadata, f)
        samples.append({
            "image_file": f"data/{i:06d}/image.jpg",
            "depth_file": f"data/{i:06d}/depth.png",
            "metadata_file": f"data/{i:06d}/metadata.json",
            "joints_3d": joints.tolist(),
            "camera_params": {"R": np.eye(3).tolist(), "t": [0, 0, 0],
                              "f": [1000, 1000],
                              "c": [size / 2, size / 2]},
            "bbox": [0, 0, size, size], "action": 2, "subaction": 1,
            "frame_idx": i, "cam_idx": 1, "subject": 1,
            "depth_min": 1.5, "depth_max": 7.5,
            "keypoints": metadata["keypoints"],
            "image_size": [size, size],
        })
    with open(stage / "samples.pkl", "wb") as f:
        pickle.dump(samples, f)
    parent = out_dir / prefix
    parent.mkdir(parents=True, exist_ok=True)
    tar_path = parent / f"dataset_chunk_{chunk_idx:06d}.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(stage, arcname=chunk_name)
    return tar_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup-steps", type=int, default=3)
    ap.add_argument("--samples", type=int, default=180)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--size", type=int, default=500)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_cache_e2e")

    root = Path(tempfile.mkdtemp(prefix="e2e_train_"))
    rng = np.random.default_rng(0)
    w_map = rng.normal(size=(17, 3, 3)) * np.array([300, 300, 50])[:, None]
    print(f"building {args.chunks}+1 chunks of {args.samples} samples "
          f"at {args.size}px in {root} ...", flush=True)
    for c in range(args.chunks):
        make_learnable_chunk(root / "chunks", c, args.samples, args.size,
                             w_map, "train")
    make_learnable_chunk(root / "chunks", args.chunks, args.samples,
                         args.size, w_map, "test")

    from pose3d_tpu.cli.main import main as train_main

    os.chdir(root)

    def run(steps):
        t0 = time.perf_counter()
        train_main([
            "--chunks-dir", str(root / "chunks"),
            "--train-chunks", *[str(c) for c in range(args.chunks)],
            "--val-chunks", str(args.chunks),
            "--cache-dir", str(root / "cache"),
            "--model-type", "cnn",
            "--num-steps", str(steps),
            "--eval-interval", str(steps),
            "--log-interval", "10",
            "--no-tensorboard",
        ])
        return time.perf_counter() - t0

    print(f"warm-up run ({args.warmup_steps} steps, populates the XLA "
          "cache)...", flush=True)
    t_warm = run(args.warmup_steps)
    print(f"warm-up: {t_warm:.1f}s", flush=True)
    t = run(args.steps)
    eff = args.steps * 100
    print(f"TIMED RUN: {args.steps} steps ({eff} images) in {t:.1f}s "
          f"end-to-end → {eff / t:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
