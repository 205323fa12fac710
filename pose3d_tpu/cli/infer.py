"""Inference CLI — drop-in equivalent of the reference's ``infer.py``.

Flow parity (reference infer.py:396-510): load the lifting model from a
self-describing checkpoint, run stage 1 (2D keypoints + metric depth) per
image, lift to 3D, save ``<stem>_pred_joints3d.npy`` and optionally a 2×2
visualization panel (original | 2D keypoints | depth colormap | 3D pose).

TPU-first: images are processed in jit-compiled BATCHES end-to-end rather
than the reference's one-image-at-a-time triple dispatch (SURVEY.md §3.2
"north star"). Stage-1 backends: ``--stage1 cached`` consumes preprocess
artifacts (no external models needed); ``--stage1 jax`` runs the native
JAX keypoint/depth models.

Usage:
  python -m pose3d_tpu.cli.infer --checkpoint_path ck_cnn_step_100 \
      --input_folder imgs/ --model-type cnn --output_folder out/ --visualize
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List

import cv2
import numpy as np

from pose3d_tpu.core.config import CONNECTIONS_COCO, make_model_config
from pose3d_tpu.models import init_model
from pose3d_tpu.stage1 import get_stage1_provider
from pose3d_tpu.train.checkpoint import load_checkpoint, load_checkpoint_meta

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    force=True,  # jax/absl may have installed handlers already
)
logger = logging.getLogger("Inference")

VIZ_THUMBNAIL_SIZE = (500, 500)


def load_pose_model(checkpoint_path, model_type=None, ema=False):
    """Rebuild architecture from checkpoint metadata and load weights
    (reference infer.py:73-131). Returns (model, variables, config).

    A raw reference torch ``.pth`` (self-describing, bare state_dict, or
    ``module.``-prefixed) is accepted directly and converted on the fly —
    drop-in parity with the reference's own loader. ``ema=True`` loads the
    EMA weights recorded by training with ``--ema-decay``."""
    from pose3d_tpu.cli.convert import ensure_framework_checkpoint

    checkpoint_path = ensure_framework_checkpoint(
        checkpoint_path, model_type=model_type
    )
    meta = load_checkpoint_meta(checkpoint_path)
    model_type = meta.get("model_type", model_type)
    model_cfg = make_model_config(model_type, **meta.get("model_args", {}))
    model, variables = init_model(model_cfg, batch_size=1)
    tree, _ = load_checkpoint(checkpoint_path)
    params = tree["params"]
    batch_stats = tree.get("batch_stats", variables.get("batch_stats", {}))
    if ema:
        if "ema_params" not in tree:
            raise SystemExit(
                f"--ema: checkpoint {checkpoint_path} carries no EMA "
                "weights (train with --ema-decay to record them)"
            )
        params = tree["ema_params"]
        # Averaged weights need the matching averaged BN stats (legacy
        # EMA checkpoints lack the mirror — live stats reproduce their
        # old behavior).
        batch_stats = tree.get("ema_batch_stats", batch_stats)
        logger.info("Using EMA weights")
    variables = {"params": params, "batch_stats": batch_stats}
    logger.info("3D Pose Model loaded successfully (%s).", model_type)
    return model, variables, model_cfg


def _resize_batch(images: List[np.ndarray], size_hw) -> np.ndarray:
    h, w = size_hw
    return np.stack(
        [cv2.resize(im, (w, h), interpolation=cv2.INTER_LINEAR) for im in images]
    )


def create_depth_viz(depth: np.ndarray) -> np.ndarray:
    """Viridis-colored uint8 depth panel (reference infer.py:255-272)."""
    import matplotlib.cm as cm

    d = depth.astype(np.float32)
    rng = d.max() - d.min()
    d01 = (d - d.min()) / rng if rng > 0 else np.zeros_like(d)
    rgba = cm.viridis(d01)
    return (rgba[..., :3] * 255).astype(np.uint8)


def create_2d_kpts_viz(image_rgb: np.ndarray, kpts: np.ndarray) -> np.ndarray:
    """Keypoint + COCO-skeleton overlay (reference infer.py:275-316)."""
    img = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR).copy()
    h, w = img.shape[:2]
    px = (kpts[:, 0] * w).astype(int)
    py = (kpts[:, 1] * h).astype(int)
    conf = kpts[:, 2]
    for i in range(len(px)):
        if conf[i] > 0:
            cv2.circle(img, (px[i], py[i]), 5, (0, 0, 255), -1)
    for s, e in CONNECTIONS_COCO:
        if s < len(px) and e < len(px) and conf[s] > 0 and conf[e] > 0:
            cv2.line(img, (px[s], py[s]), (px[e], py[e]), (0, 255, 0), 2)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _thumb(img: np.ndarray, size=VIZ_THUMBNAIL_SIZE) -> np.ndarray:
    th, tw = size
    h, w = img.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = int(h * scale), int(w * scale)
    resized = cv2.resize(img, (nw, nh))
    canvas = np.full((th, tw, 3), 255, np.uint8)
    canvas[:nh, :nw] = resized
    return canvas


def make_lifter(model, variables, model_cfg):
    """Jitted compact-transfer lifter call shared by the infer CLI and the
    full-pipeline serving mode (serve_http): takes decoded full-res RGB
    images + their Stage1Results, ships uint8 pixels (4x less
    host->device traffic; train.step.decompact_batch decodes on device)
    and returns [b, J, 3] joints."""
    import jax

    from pose3d_tpu.train.step import decompact_batch

    size_hw = tuple(model_cfg.image_size)

    def _fwd(v, img_u8, dep_u8, scale, kp):
        b = decompact_batch(
            {"image": img_u8, "depth": dep_u8, "depth_scale": scale}
        )
        return model.apply(v, b["image"], b["depth"], kp, train=False)

    fwd = jax.jit(_fwd)

    def lift(raws, s1s):
        images = _resize_batch(raws, size_hw)  # uint8 [b,H,W,3]
        dep_u8, scales = [], []
        for s in s1s:
            lo, hi = float(s.depth.min()), float(s.depth.max())
            rngv = hi - lo if hi > lo else 1.0
            d01 = (s.depth - lo) / rngv
            dep_u8.append(
                np.clip(d01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
            )
            scales.append([lo, hi])
        depths = _resize_batch([d[..., None] for d in dep_u8], size_hw)
        if depths.ndim == 3:
            depths = depths[..., None]
        scales = np.asarray(scales, np.float32)
        kpts = np.stack(
            [s.keypoints[:, :2] for s in s1s]
        ).astype(np.float32)
        return np.asarray(fwd(variables, images, depths, scales, kpts))

    return lift


def run(args):
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    import jax

    out_dir = Path(args.output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)

    model, variables, model_cfg = load_pose_model(
        args.checkpoint_path, args.model_type, ema=getattr(args, "ema", False)
    )
    extra = {}
    if args.stage1 == "jax" and args.data_parallel:
        # mirror cli/preprocess.py: shard stage-1 batches over all devices
        from pose3d_tpu.core.mesh import make_mesh

        extra["mesh"] = make_mesh((len(jax.devices()),), ("data",))
        logger.info("Data-parallel stage-1 over %s", extra["mesh"])
    if args.stage1 == "jax":
        extra["confidence_threshold"] = args.yolo_confidence_threshold
        if not args.kp_weights and args.yolo_model_path:
            # drop-in parity: the reference's --yolo_model_path names the
            # ultralytics checkpoint (infer.py:138); honor it here too.
            # An explicitly given path that doesn't exist is an error,
            # NOT a silent fall-through to random-init networks.
            if not Path(args.yolo_model_path).exists():
                raise SystemExit(
                    f"--yolo_model_path {args.yolo_model_path!r} does not "
                    "exist"
                )
            args.kp_weights = args.yolo_model_path
        if args.kp_weights:
            extra["kp_weights"] = args.kp_weights
            extra["kp_input_size"] = args.kp_input_size
        if args.depth_weights:
            extra["depth_weights"] = args.depth_weights
            extra["depth_input_size"] = args.depth_input_size
        if not (args.kp_weights and args.depth_weights) \
                and not args.allow_untrained:
            missing = [
                n for n, v in (("--kp-weights", args.kp_weights),
                               ("--depth-weights", args.depth_weights))
                if not v
            ]
            raise SystemExit(
                f"--stage1 jax without {'/'.join(missing)} would run with "
                "randomly initialized stage-1 networks and emit noise as "
                "predictions. Provide pretrained weights, pass "
                "--allow-untrained to proceed anyway, or use "
                "--stage1 cached with preprocess artifacts."
            )
    provider = get_stage1_provider(
        args.stage1, num_joints=args.num_joints, **extra
    )

    in_dir = Path(args.input_folder)
    image_files = sorted(
        f for f in in_dir.iterdir()
        if f.is_file() and f.suffix.lower() in (".png", ".jpg", ".jpeg")
        and not f.stem.endswith("_depth")  # preprocess artifacts, not inputs
    )
    if not image_files:
        logger.warning("No images found in %s", args.input_folder)
        return 0

    lift = make_lifter(model, variables, model_cfg)

    n_done = 0
    B = args.batch_size
    for i in range(0, len(image_files), B):
        files = image_files[i : i + B]
        decoded, paths = [], []
        for f in files:
            bgr = cv2.imread(str(f), cv2.IMREAD_COLOR)
            if bgr is None:
                logger.error("Could not open image %s", f.name)
                continue
            decoded.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
            paths.append(f)
        if not paths:
            continue
        # ONE stage-1 dispatch for the whole CLI batch: keypoints and depth
        # each run as a single jitted batched call (JaxStage1.predict_batch)
        # instead of the reference's per-image triple dispatch
        # (infer.py:424; SURVEY.md §3.2). Batches are PADDED back up to B
        # (repeat the first element, slice the results): every distinct
        # batch size — the final remainder, or any batch shrunk by an
        # unreadable image — would otherwise trigger a fresh ~40 s jit
        # compile of the stage-1 and lifter programs on this platform.
        real = len(paths)
        pad = B - real
        s1_list = provider.predict(
            paths + [paths[0]] * pad, images=decoded + [decoded[0]] * pad
        )[:real]
        raws, s1s, kept = [], [], []
        for f, rgb, s1 in zip(paths, decoded, s1_list):
            if s1 is None:
                logger.warning("Skipping %s: no stage-1 outputs.", f.name)
                continue
            raws.append(rgb)
            s1s.append(s1)
            kept.append(f)
        if not kept:
            continue

        padk = B - len(kept)
        preds = lift(
            raws + [raws[0]] * padk, s1s + [s1s[0]] * padk
        )[: len(kept)]  # [b,J,3]

        for f, raw, s1, joints in zip(kept, raws, s1s, preds):
            npy_path = out_dir / f"{f.stem}_pred_joints3d.npy"
            np.save(npy_path, joints)
            logger.info("Saved predicted 3D joints to %s", npy_path)
            n_done += 1

            if args.visualize:
                try:
                    import matplotlib.pyplot as plt

                    from pose3d_tpu.viz import fig_to_image, visualize_3d_pose

                    panel_orig = _thumb(raw)
                    panel_kpts = _thumb(create_2d_kpts_viz(raw, s1.keypoints))
                    panel_depth = _thumb(create_depth_viz(s1.depth))
                    fig = visualize_3d_pose(
                        joints.copy(), title="Predicted 3D Pose"
                    )
                    pose_img = np.asarray(fig_to_image(fig))
                    plt.close(fig)
                    panel_pose = _thumb(pose_img)

                    top = np.concatenate([panel_orig, panel_kpts], axis=1)
                    bottom = np.concatenate([panel_depth, panel_pose], axis=1)
                    combined = np.concatenate([top, bottom], axis=0)
                    viz_path = out_dir / f"{f.stem}_combined_viz.png"
                    cv2.imwrite(
                        str(viz_path),
                        cv2.cvtColor(combined, cv2.COLOR_RGB2BGR),
                    )
                    logger.info("Saved combined visualization to %s", viz_path)
                except Exception:
                    logger.exception(
                        "Failed to create visualization for %s", f.name
                    )
    logger.info("Inference processing complete.")
    return n_done


def build_parser():
    p = argparse.ArgumentParser(
        description="Run 3D Human Pose Estimation Inference (TPU)"
    )
    p.add_argument("--checkpoint_path", type=str, required=True)
    p.add_argument("--input_folder", type=str, required=True)
    p.add_argument("--model-type", type=str,
                   choices=["cnn", "transformer"], default=None)
    p.add_argument("--output_folder", type=str, default="inference_output")
    p.add_argument("--num_joints", type=int, default=17)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--ema", action="store_true",
                   help="Use the checkpoint's EMA weights (recorded by "
                        "training with --ema-decay)")
    p.add_argument("--stage1", type=str, default="cached",
                   choices=["cached", "jax"],
                   help="Stage-1 backend: cached preprocess artifacts or "
                        "native JAX models")
    p.add_argument("--batch-size", type=int, default=8,
                   help="Images lifted per jitted batch")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard stage-1 batches over all devices (mesh data "
                        "axis; --stage1 jax only, same as preprocess)")
    p.add_argument("--yolo_model_path", type=str, default=None,
                   help="Reference-compat alias for --kp-weights with "
                        "--stage1 jax (ignored by the cached backend)")
    p.add_argument("--kp-weights", type=str, default=None,
                   help="Pretrained keypoint-model weights for --stage1 jax "
                        "(ultralytics YOLO11-pose .pt/.safetensors)")
    p.add_argument("--depth-weights", type=str, default=None,
                   help="Pretrained depth-model weights for --stage1 jax "
                        "(DepthPro .safetensors)")
    p.add_argument("--kp-input-size", type=int, default=640,
                   help="Keypoint-model input resolution (upstream 640)")
    p.add_argument("--depth-input-size", type=int, default=1536,
                   help="Depth-model input resolution (upstream 1536)")
    p.add_argument("--allow-untrained", action="store_true",
                   help="Permit --stage1 jax with randomly initialized "
                        "networks (outputs are noise; testing only)")
    p.add_argument("--yolo_confidence_threshold", type=float, default=0.3,
                   help="Keypoints below this confidence are zeroed "
                        "(actually applied here, unlike the reference)")
    return p


def main(argv=None):
    return run(build_parser().parse_args(argv))


def cli(argv=None) -> int:
    """Console-script entry (pyproject [project.scripts]): the wrapper
    calls ``sys.exit(cli())``, so return 0 — ``main``'s informative
    return value (images processed) would otherwise become the exit status and a
    successful run would report failure."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
