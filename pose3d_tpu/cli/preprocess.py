"""Preprocess CLI — equivalent of the reference's ``preprocess.py``.

Walks subfolders of ``input_base``; for every image runs stage 1 (2D
keypoints + metric depth) and writes, next to the mirrored output path
(reference preprocess.py:83-94):

  * ``<stem>_depth.png`` — uint8 min/max-normalized depth;
  * ``<stem>.json`` — {image_size, depth_size, skeleton (COCO edges),
    keypoints (list of persons → list of {x, y} pixel dicts),
    depth_min, depth_max}.

Resume semantics match the reference: skip-if-outputs-exist per image
(preprocess.py:54-55) and a ``finished.txt`` marker per folder (:97-98).

TPU-first: images are processed in BATCHES through the jitted stage-1
models instead of the reference's sequential per-image model calls
(SURVEY.md §3.3 bottleneck).

Usage:
  python -m pose3d_tpu.cli.preprocess <input_base> <output_base> \
      [--batch-size 16] [--input-size 512]
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import cv2
import numpy as np

from pose3d_tpu.core.config import CONNECTIONS_COCO

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("Preprocess")

IMAGE_EXTS = (".png", ".jpg", ".jpeg")


def _outputs_for(image_path: Path, out_dir: Path):
    stem = image_path.stem
    return out_dir / f"{stem}_depth.png", out_dir / f"{stem}.json"


def process_folder(folder: Path, out_dir: Path, provider, batch_size: int):
    out_dir.mkdir(parents=True, exist_ok=True)
    done_marker = out_dir / "finished.txt"
    if done_marker.exists():
        logger.info("Skipping %s (finished.txt present)", folder.name)
        return 0

    images = sorted(
        f for f in folder.iterdir()
        if f.is_file() and f.suffix.lower() in IMAGE_EXTS
        and not f.stem.endswith("_depth")
    )
    todo = [
        f for f in images
        if not all(p.exists() for p in _outputs_for(f, out_dir))
    ]
    logger.info(
        "%s: %d images, %d to process", folder.name, len(images), len(todo)
    )

    n = 0
    for i in range(0, len(todo), batch_size):
        files = todo[i : i + batch_size]
        rgbs, kept = [], []
        for f in files:
            bgr = cv2.imread(str(f), cv2.IMREAD_COLOR)
            if bgr is None:
                logger.error("Unreadable image %s", f)
                continue
            rgbs.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
            kept.append(f)
        if not kept:
            continue
        # Pad ragged batches back to batch_size (repeat first, slice
        # results): each distinct batch size would otherwise jit-compile
        # a fresh stage-1 program (~40 s on this platform) — fatal for a
        # 1M-image sweep with scattered unreadable files.
        pad = batch_size - len(kept)
        results = provider.predict_batch(
            rgbs + [rgbs[0]] * pad
        )[: len(kept)]
        for f, rgb, res in zip(kept, rgbs, results):
            h, w = rgb.shape[:2]
            depth_path, meta_path = _outputs_for(f, out_dir)
            # min/max-normalize depth to uint8 (reference preprocess.py:79-81)
            d = res.depth
            dmin, dmax = float(d.min()), float(d.max())
            rngv = dmax - dmin if dmax > dmin else 1.0
            d_u8 = ((d - dmin) / rngv * 255.0).astype(np.uint8)
            cv2.imwrite(str(depth_path), d_u8)
            # pixel keypoints (reference stores ints, preprocess.py:62-68)
            kp = res.keypoints
            persons = [[
                {"x": int(round(float(x) * w)), "y": int(round(float(y) * h)),
                 "conf": float(c)}
                for x, y, c in kp
            ]]
            meta = {
                "image_size": [w, h],
                "depth_size": [int(d.shape[1]), int(d.shape[0])],
                "skeleton": [list(e) for e in CONNECTIONS_COCO],
                "keypoints": persons,
                "depth_min": dmin,
                "depth_max": dmax,
            }
            with open(meta_path, "w") as fp:
                json.dump(meta, fp)
            n += 1
    done_marker.write_text("done\n")
    return n


def build_parser():
    p = argparse.ArgumentParser(
        description="Stage-1 preprocess: 2D keypoints + depth per image"
    )
    p.add_argument("input_base", type=str)
    p.add_argument("output_base", type=str)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--input-size", type=int, default=512)
    p.add_argument("--stage1", type=str, default="jax", choices=["jax"],
                   help="Stage-1 backend (native JAX models)")
    p.add_argument("--kp-weights", type=str, default=None,
                   help="Pretrained keypoint weights (ultralytics "
                        "YOLO11-pose .pt/.safetensors); random-init "
                        "KeypointNet otherwise")
    p.add_argument("--depth-weights", type=str, default=None,
                   help="Pretrained depth weights (DepthPro "
                        ".safetensors/.pt); random-init DepthNet otherwise")
    p.add_argument("--allow-untrained", action="store_true",
                   help="Permit running without pretrained stage-1 weights "
                        "(outputs are noise; testing only)")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard stage-1 batches over all devices (mesh data "
                        "axis) — the multi-chip preprocess sweep")
    return p


def main(argv=None):
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    args = build_parser().parse_args(argv)
    from pose3d_tpu.stage1.models import JaxStage1

    if not (args.kp_weights and args.depth_weights) \
            and not args.allow_untrained:
        missing = [n for n, v in (("--kp-weights", args.kp_weights),
                                  ("--depth-weights", args.depth_weights))
                   if not v]
        raise SystemExit(
            f"preprocess without {'/'.join(missing)} would write noise "
            "artifacts from randomly initialized stage-1 networks. Provide "
            "pretrained weights or pass --allow-untrained."
        )
    mesh = None
    if args.data_parallel:
        import jax

        from pose3d_tpu.core.mesh import make_mesh

        mesh = make_mesh((len(jax.devices()),), ("data",))
        logger.info("Data-parallel stage-1 over %s", mesh)
    provider = JaxStage1(
        input_size=args.input_size,
        kp_weights=args.kp_weights,
        depth_weights=args.depth_weights,
        mesh=mesh,
    )

    input_base = Path(args.input_base)
    output_base = Path(args.output_base)
    folders = sorted(d for d in input_base.iterdir() if d.is_dir())
    if not folders:
        folders = [input_base]
    total = 0
    for folder in folders:
        rel = folder.relative_to(input_base) if folder != input_base else Path()
        total += process_folder(
            folder, output_base / rel, provider, args.batch_size
        )
    logger.info("Preprocessing complete: %d images processed", total)
    return total


def cli(argv=None) -> int:
    """Console-script entry (pyproject [project.scripts]): the wrapper
    calls ``sys.exit(cli())``, so return 0 — ``main``'s informative
    return value (images processed) would otherwise become the exit status and a
    successful run would report failure."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
