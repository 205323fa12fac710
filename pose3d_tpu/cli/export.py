"""Export a trained checkpoint to a self-contained serving artifact.

The reference has no deployment path: serving means running the full
training repo (reference infer.py loads src/models, torch, ultralytics).
``pose3d-export`` lowers the lifter's inference step to serialized
StableHLO with the weights baked in (pose3d_tpu/serve.py) — the output
directory is loadable with nothing but jax installed:

    from pose3d_tpu.serve import load_exported     # or inline the 3-line
    model = load_exported("exported_cnn/")         # deserialize wrapper
    joints = model.call(image, depth, keypoints_2d)

Accepts framework checkpoint directories AND raw reference ``.pth`` files
(converted on the fly, same as infer/evaluate).
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import List, Optional

logger = logging.getLogger("pose3d_tpu.export")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a checkpoint to a self-contained StableHLO "
                    "serving artifact"
    )
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Framework checkpoint dir or reference .pth")
    p.add_argument("--output", type=str, required=True,
                   help="Output artifact directory")
    p.add_argument("--batch-size", type=str, default="dynamic",
                   help="Static batch size, or 'dynamic' (default) for a "
                        "symbolic batch dimension — one artifact serves "
                        "any request size")
    p.add_argument("--platforms", type=str, nargs="+", default=None,
                   help="Target platforms, e.g. 'tpu' or 'tpu cpu' "
                        "(default: the current backend)")
    p.add_argument("--attention-backend", type=str, default="xla",
                   choices=["pallas", "xla"],
                   help="xla (default) keeps the artifact free of "
                        "platform-specific custom calls; pallas embeds "
                        "the fused kernel (TPU-only artifact)")
    p.add_argument("--ema", action="store_true",
                   help="Export the checkpoint's EMA weights (recorded by "
                        "training with --ema-decay)")
    p.add_argument("--model-type", choices=["cnn", "transformer"],
                   default=None,
                   help="Architecture hint for converting a BARE torch "
                        "state_dict .pth (self-describing checkpoints "
                        "ignore it)")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8"],
                   help="weight-only per-channel int8 PTQ of the large "
                        "kernels before lowering: ~4x smaller artifact, "
                        "dequant fused into each consumer at run time")
    return p


def main(argv: Optional[List[str]] = None) -> str:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()

    from pose3d_tpu.cli.convert import ensure_framework_checkpoint
    from pose3d_tpu.core.config import GlobalConfig, make_model_config
    from pose3d_tpu.models import init_model
    from pose3d_tpu.serve import export_lifter, save_exported
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import (
        load_checkpoint_meta,
        restore_train_state,
    )

    checkpoint = ensure_framework_checkpoint(
        args.checkpoint, model_type=args.model_type
    )
    meta = load_checkpoint_meta(checkpoint)
    cfg = GlobalConfig()
    model_type = meta.get("model_type", cfg.model_type)
    model_cfg = make_model_config(model_type, **meta.get("model_args", {}))

    batch = None if args.batch_size == "dynamic" else int(args.batch_size)
    model, variables = init_model(
        model_cfg, batch_size=batch or 1,
        attention_backend=args.attention_backend,
    )
    if args.ema:
        from pose3d_tpu.train.checkpoint import checkpoint_has_ema

        if not checkpoint_has_ema(checkpoint):
            raise SystemExit(
                f"--ema: checkpoint {checkpoint} carries no EMA weights "
                "(train with --ema-decay to record them)"
            )
    state, _ = restore_train_state(
        create_train_state(model, variables, ema=args.ema), checkpoint
    )
    if args.ema:
        from pose3d_tpu.train.state import with_ema_params

        state = with_ema_params(state)  # swaps params AND averaged BN stats
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    exported = export_lifter(
        model, variables, tuple(model_cfg.image_size),
        batch_size=batch, platforms=args.platforms,
        num_joints=model_cfg.num_joints, quantize=args.quantize,
    )
    path = save_exported(
        exported, args.output,
        extra_meta={
            "model_type": model_type,
            "checkpoint_step": int(meta.get("step", 0)),
            "image_size": list(model_cfg.image_size),
            "batch": args.batch_size,
            "quantize": args.quantize,
            "ema": bool(args.ema),
        },
    )
    logger.info("Wrote serving artifact to %s", path)
    return str(path)


def cli(argv=None) -> int:
    """Console-script entry (pyproject [project.scripts]): the wrapper
    calls ``sys.exit(cli())``, so return 0 — ``main``'s informative
    return value (the artifact path) would otherwise become the exit status and a
    successful run would report failure."""
    main(argv)
    return 0


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
