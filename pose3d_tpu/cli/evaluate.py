"""Eval-only CLI: load a checkpoint, run the exact validation pass over a
chunk set, print MPJPE / PA-MPJPE / loss components.

This is the accuracy-parity staging tool: a reference ``.pth`` converted
with ``pose3d-convert`` (cli/convert.py, forward parity proven to 1e-3)
can be evaluated here over real chunks, proving the whole metric pipeline
(data → model → MPJPE/PA-MPJPE) end-to-end without training. The metric
math matches the reference validation loop (src/train.py:203-298) with
exact masked averaging over ragged final batches.

Usage:
  python -m pose3d_tpu.cli.evaluate --checkpoint ck --chunks-dir chunks \
      --val-chunks 0 1 [--compat-pa-metric] [--absolute-pose] [--json out]
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    force=True,
)
logger = logging.getLogger("Evaluate")


def build_parser():
    p = argparse.ArgumentParser(
        description="Evaluate a checkpoint over validation chunks (TPU)"
    )
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--chunks-dir", type=str, required=True)
    p.add_argument("--val-chunks", type=int, nargs="+", default=None)
    p.add_argument("--prefix", type=str, default="test",
                   help="Chunk filename prefix subdirectory (train|test)")
    p.add_argument("--cache-dir", type=str, default=None)
    p.add_argument("--chunk-io", choices=["auto", "stream", "extract"],
                   default="auto",
                   help="Chunk archive access mode (see pose3d-train)")
    p.add_argument("--pixel-dtype", choices=["uint8", "float32"],
                   default="uint8",
                   help="Host-pipeline pixel representation "
                        "(see pose3d-train)")
    p.add_argument("--model-type", choices=["cnn", "transformer"],
                   default=None,
                   help="Architecture hint for converting a BARE torch "
                        "state_dict .pth (self-describing checkpoints "
                        "ignore it)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--absolute-pose", action="store_true",
                   help="Evaluate absolute camera-space joints (DEP-P) "
                        "instead of root-relative (IND-P)")
    p.add_argument("--compat-pa-metric", action="store_true",
                   help="Report PA-MPJPE with the reference's transposed-"
                        "rotation convention instead of true Procrustes")
    p.add_argument("--attention-backend", type=str, default="pallas",
                   choices=["pallas", "xla"])
    p.add_argument("--ema", action="store_true",
                   help="Evaluate the checkpoint's EMA weights (saved by "
                        "training with --ema-decay) instead of the live "
                        "params")
    p.add_argument("--per-action", action="store_true",
                   help="Also report MPJPE/PA-MPJPE per H3.6M action "
                        "(standard protocol breakdown; the reference only "
                        "reports the overall mean)")
    p.add_argument("--json", type=str, default=None,
                   help="Also write metrics to this JSON file")
    return p


def run(args) -> dict:
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()

    from pose3d_tpu.core.config import GlobalConfig, make_model_config
    from pose3d_tpu.core.mesh import make_data_mesh_for_batch
    from pose3d_tpu.data import BatchLoader, StreamingChunkedDataset
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import (
        load_checkpoint_meta,
        restore_train_state,
    )
    from pose3d_tpu.train.loop import evaluate
    from pose3d_tpu.train.step import make_eval_step

    cfg = GlobalConfig()
    batch_size = args.batch_size or cfg.batch_size

    from pose3d_tpu.cli.convert import ensure_framework_checkpoint

    # raw reference .pth checkpoints are converted on the fly
    args.checkpoint = ensure_framework_checkpoint(
        args.checkpoint, model_type=args.model_type
    )
    meta = load_checkpoint_meta(args.checkpoint)
    model_type = meta.get("model_type", cfg.model_type)
    model_cfg = make_model_config(model_type, **meta.get("model_args", {}))
    model, variables = init_model(
        model_cfg, batch_size=batch_size,
        attention_backend=args.attention_backend,
    )
    if args.ema:
        from pose3d_tpu.train.checkpoint import checkpoint_has_ema

        if not checkpoint_has_ema(args.checkpoint):
            raise SystemExit(
                f"--ema: checkpoint {args.checkpoint} carries no EMA "
                "weights (train with --ema-decay to record them)"
            )
    state = create_train_state(model, variables, ema=args.ema)
    state, _ = restore_train_state(state, args.checkpoint)
    if args.ema:
        from pose3d_tpu.train.state import with_ema_params

        state = with_ema_params(state)
        logger.info("Evaluating EMA weights")
    step = int(meta.get("step", 0))
    logger.info("Evaluating %s checkpoint %s (step %d)",
                model_type, args.checkpoint, step)

    cache_dir = Path(args.cache_dir) if args.cache_dir else None
    val_ds = StreamingChunkedDataset(
        args.prefix, args.chunks_dir, chunk_indices=args.val_chunks,
        image_size=tuple(model_cfg.image_size), cache_dir=cache_dir,
        shuffle=False, shuffle_chunks=False,
        root_relative=not args.absolute_pose, chunk_io=args.chunk_io,
        pixel_dtype=args.pixel_dtype,
    )
    val_loader = BatchLoader(val_ds, batch_size, drop_last=False)

    mesh = make_data_mesh_for_batch(batch_size)
    eval_step = make_eval_step(
        model, mesh=mesh, compat_pa=args.compat_pa_metric, per_sample=True,
    )
    metrics = evaluate(eval_step, state, val_loader, pad_to=batch_size,
                       per_action=args.per_action, mesh=mesh)
    per_action = metrics.pop("per_action", None)
    metrics = {k: float(v) for k, v in metrics.items()}
    metrics["checkpoint_step"] = step

    logger.info("MPJPE      : %.2f mm", metrics["mpjpe"])
    logger.info("PA-MPJPE   : %.2f mm", metrics["pa_mpjpe"])
    for k, v in sorted(metrics.items()):
        # checkpoint_step is an integer id, already in the INFO header —
        # keep it out of the float-formatted loss-component listing
        if k not in ("mpjpe", "pa_mpjpe", "checkpoint_step"):
            logger.info("%-11s: %.4f", k, v)
    if per_action is not None:
        logger.info("Per-action breakdown (%d actions):", len(per_action))
        for a, m in per_action.items():
            logger.info("  %-18s MPJPE %7.2f  PA-MPJPE %7.2f  (n=%d)",
                        a, m["mpjpe"], m["pa_mpjpe"], m["count"])
        metrics["per_action"] = per_action
    print(json.dumps(metrics))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


def main(argv=None):
    return run(build_parser().parse_args(argv))


def cli(argv=None) -> int:
    """Console-script entry (pyproject [project.scripts]): the wrapper
    calls ``sys.exit(cli())``, so return 0 — ``main``'s informative
    return value (the metrics dict) would otherwise become the exit status and a
    successful run would report failure."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
