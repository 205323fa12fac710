"""Stage-1 provider API: 2D keypoints + metric depth per image.

The reference calls two external pretrained models per image — YOLO11x-pose
for 17 COCO keypoints and Apple DepthPro for metric depth — in both
``preprocess.py`` (offline sweep) and ``infer.py`` (online). This framework
abstracts them behind one provider interface with interchangeable backends:

  * :class:`CachedStage1` — reads the artifacts the preprocess stage wrote
    (``<stem>_depth.png`` + ``<stem>.json``; reference preprocess.py:83-94),
    so inference runs with zero model dependencies (BASELINE.json config #1).
  * :class:`JaxStage1` (stage1/models.py) — batched, jitted JAX keypoint +
    depth networks replacing the per-image torch calls.

Keypoint convention (reference infer.py:156-237): [J, 3] rows of
(x/W, y/H, conf), padded/truncated to 17 joints, zeros when nothing
detected. Depth convention: metric depth map at original image resolution
(reference infer.py:240-252).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence

import cv2
import numpy as np

logger = logging.getLogger("pose3d_tpu.stage1")


@dataclass
class Stage1Result:
    """Per-image stage-1 outputs."""

    keypoints: np.ndarray  # [J, 3] (norm_x, norm_y, conf)
    depth: np.ndarray      # [H, W] metric depth at original resolution
    depth_min: float
    depth_max: float


class CachedStage1:
    """Reads preprocess artifacts next to each image:
    ``<stem>_depth.png`` (uint8, min/max-normalized) and ``<stem>.json``
    ({image_size, keypoints, depth_min, depth_max}; reference
    preprocess.py:83-94). Depth is denormalized back to metric with the
    stored min/max — the same convention the training pipeline uses
    (reference chunked_dataset.py:159-167)."""

    def __init__(self, num_joints: int = 17):
        self.num_joints = num_joints

    def available_for(self, image_path) -> bool:
        p = Path(image_path)
        return (
            p.with_name(p.stem + "_depth.png").exists()
            and p.with_suffix(".json").exists()
        )

    def predict_one(self, image_path, image: Optional[np.ndarray] = None
                    ) -> Optional[Stage1Result]:
        p = Path(image_path)
        depth_path = p.with_name(p.stem + "_depth.png")
        meta_path = p.with_suffix(".json")
        if not depth_path.exists() or not meta_path.exists():
            logger.warning("No cached stage-1 artifacts for %s", p)
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        depth_u8 = cv2.imread(str(depth_path), cv2.IMREAD_GRAYSCALE)
        if depth_u8 is None:
            return None
        dmin = float(meta.get("depth_min", 0.0))
        dmax = float(meta.get("depth_max", 1.0))
        depth = depth_u8.astype(np.float32) / 255.0 * (dmax - dmin) + dmin

        w, h = meta.get("image_size", [depth.shape[1], depth.shape[0]])
        kpts = np.zeros((self.num_joints, 3), np.float32)
        kp_data = meta.get("keypoints") or []
        # preprocess.py writes list-of-persons, each a list of {x, y[, conf]}
        person = None
        if kp_data and isinstance(kp_data[0], list):
            person = kp_data[0]
        elif kp_data and isinstance(kp_data[0], dict):
            person = kp_data
        if person:
            for i, kp in enumerate(person[: self.num_joints]):
                kpts[i, 0] = float(kp["x"]) / float(w)
                kpts[i, 1] = float(kp["y"]) / float(h)
                kpts[i, 2] = float(kp.get("conf", 1.0))
        return Stage1Result(kpts, depth, dmin, dmax)

    def predict(self, image_paths: Sequence, images=None
                ) -> List[Optional[Stage1Result]]:
        return [self.predict_one(p) for p in image_paths]


def get_stage1_provider(kind: str = "cached", **kwargs):
    """Factory: 'cached' | 'jax'."""
    if kind == "cached":
        return CachedStage1(**kwargs)
    if kind == "jax":
        from pose3d_tpu.stage1.models import JaxStage1

        return JaxStage1(**kwargs)
    raise ValueError(f"Unknown stage1 provider: {kind}")
