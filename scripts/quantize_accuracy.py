"""Measured int8 weight-only PTQ accuracy on TRAINED weights (VERDICT r3
item 4): export the overfit-demo checkpoint as f32 and int8 artifacts
(and the --ema variants when the checkpoint carries EMA params), run all
of them on the checkpoint's own held-out batch, and report
MPJPE(int8) − MPJPE(f32) — replacing the round-3 "trained nets deviate
far less [than the 2.5% random-weight toy]" assertion with a number.

Usage:
    python scripts/overfit_demo.py --steps 600 --ema-decay 0.999 \
        --save-checkpoint /tmp/overfit_ckpt
    python scripts/quantize_accuracy.py /tmp/overfit_ckpt
"""

from __future__ import annotations

import argparse
import json
import tempfile
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="overfit_demo --save-checkpoint dir")
    ap.add_argument("--out", type=str, default=None,
                    help="artifact staging dir (default: a temp dir)")
    args = ap.parse_args()

    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()

    import jax

    from pose3d_tpu import serve
    from pose3d_tpu.core.config import make_model_config
    from pose3d_tpu.geometry.metrics import mpjpe
    from pose3d_tpu.models import build_model
    from pose3d_tpu.train.checkpoint import (
        load_checkpoint,
        load_checkpoint_meta,
    )

    ckpt = Path(args.checkpoint)
    meta = load_checkpoint_meta(ckpt)
    cfg = make_model_config(meta["model_type"], **meta["model_args"])
    model = build_model(cfg)
    tree, _ = load_checkpoint(ckpt)

    held = np.load(ckpt / "held_out.npz")
    image = held["image"]
    depth = held["depth"]
    kpts = held["keypoints_2d"]
    gt = held["joints_3d"]
    batch = image.shape[0]

    out_root = Path(args.out or tempfile.mkdtemp(prefix="quant_acc_"))

    # (params, batch_stats) per variant: the EMA view pairs the averaged
    # weights with the AVERAGED BN running stats (ema_batch_stats) — live
    # stats with averaged weights are an era mismatch that breaks a BN net
    # (2909 mm vs 491 mm raw, docs/ROUND5.md; legacy checkpoints without
    # the mirror fall back to live stats).
    variants = {"": (tree["params"], tree.get("batch_stats"))}
    if tree.get("ema_params") is not None:
        variants["ema"] = (
            tree["ema_params"],
            tree.get("ema_batch_stats", tree.get("batch_stats")),
        )

    report = {}
    for tag, (params, bstats) in variants.items():
        variables = {"params": params}
        if bstats:  # transformer checkpoints carry none
            variables["batch_stats"] = bstats
        for quant in (None, "int8"):
            name = "_".join(x for x in (tag, quant or "f32") if x)
            exported = serve.export_lifter(
                model, variables, cfg.image_size, batch_size=batch,
                quantize=quant,
            )
            adir = out_root / name
            serve.save_exported(exported, adir)
            loaded = serve.load_exported(adir)
            pred = np.asarray(loaded.call(image, depth, kpts), np.float32)
            err = float(np.asarray(mpjpe(pred, gt)))
            report[f"mpjpe_mm_{name}"] = round(err, 3)
            print(f"{name:10s}: MPJPE {err:8.3f} mm "
                  f"(artifact {adir})", flush=True)

    for tag in variants:
        base = "_".join(x for x in (tag, "f32") if x)
        q = "_".join(x for x in (tag, "int8") if x)
        report[f"delta_mm_{q}"] = round(
            report[f"mpjpe_mm_{q}"] - report[f"mpjpe_mm_{base}"], 3
        )

    print(json.dumps(report))


if __name__ == "__main__":
    main()
