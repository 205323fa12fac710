"""Synthetic chunk fixtures: build tiny, fully-known tar chunks in the
reference's container format so the input pipeline / training / CLIs can be
tested end-to-end without Human3.6M (SURVEY.md §4 test strategy)."""

from __future__ import annotations

import json
import pickle
import tarfile
from pathlib import Path

import cv2
import numpy as np


def make_synthetic_chunk(
    out_dir: Path,
    chunk_idx: int,
    num_samples: int = 8,
    image_hw=(40, 50),
    num_joints: int = 17,
    prefix: str = "train",
    seed: int = 0,
    compression: str = "gz",
    num_actions: int = 1,
):
    """Write ``<out_dir>/<prefix>/dataset_chunk_<idx:06d>.tar.gz`` with
    known contents. Returns (tar_path, samples) where samples carry the
    ground-truth arrays for assertions."""
    rng = np.random.default_rng(seed + chunk_idx)
    h, w = image_hw
    chunk_name = f"chunk_{chunk_idx:06d}"
    stage = out_dir / "_stage" / chunk_name
    data_dir = stage / "data"
    samples = []
    for i in range(num_samples):
        sdir = data_dir / f"{i:06d}"
        sdir.mkdir(parents=True, exist_ok=True)
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(sdir / "image.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        depth_u8 = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
        cv2.imwrite(str(sdir / "depth.png"), depth_u8)
        dmin, dmax = 1.5, 7.5
        kpts = rng.uniform(2, [w - 2, h - 2], size=(num_joints, 2)).astype(
            np.float64
        )
        metadata = {
            "image_size": [w, h],
            "depth_size": [w, h],
            "keypoints": [
                [{"x": float(x), "y": float(y)} for x, y in kpts]
            ],
            "depth_min": dmin,
            "depth_max": dmax,
        }
        with open(sdir / "metadata.json", "w") as f:
            json.dump(metadata, f)
        joints = rng.normal(size=(num_joints, 3)).astype(np.float64) * 200
        joints[:, 2] += 5000
        sample = {
            "image_file": f"data/{i:06d}/image.jpg",
            "depth_file": f"data/{i:06d}/depth.png",
            "metadata_file": f"data/{i:06d}/metadata.json",
            "joints_3d": joints.tolist(),
            "camera_params": {
                "R": np.eye(3).tolist(),
                "t": [0.0, 0.0, 0.0],
                "f": [1000.0, 1000.0],
                "c": [w / 2, h / 2],
            },
            "bbox": [0, 0, w, h],
            "action": 2 + (i % num_actions),
            "subaction": 1,
            "frame_idx": i,
            "cam_idx": 1,
            "subject": 1,
            "depth_min": dmin,
            "depth_max": dmax,
            "keypoints": metadata["keypoints"],
            "image_size": [w, h],
        }
        samples.append(sample)
    with open(stage / "samples.pkl", "wb") as f:
        pickle.dump(samples, f)

    chunk_parent = out_dir / prefix
    chunk_parent.mkdir(parents=True, exist_ok=True)
    tar_path = chunk_parent / f"dataset_chunk_{chunk_idx:06d}.tar.{compression}"
    mode = {"gz": "w:gz", "bz2": "w:bz2", "xz": "w:xz"}[compression]
    with tarfile.open(tar_path, mode) as tar:
        tar.add(stage, arcname=chunk_name)
    return tar_path, samples


def make_synthetic_dataset(out_dir: Path, num_chunks: int = 2, **kw):
    paths = []
    all_samples = []
    for i in range(num_chunks):
        p, s = make_synthetic_chunk(out_dir, i, **kw)
        paths.append(p)
        all_samples.extend(s)
    return paths, all_samples
