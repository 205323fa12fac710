"""Checkpoint converter: reference torch ``.pth`` → pose3d_tpu checkpoint.

Gives reference users a migration path for trained models: the reference's
self-describing checkpoint ({model_state_dict, model_args, model_type},
reference train.py:300-308) is loaded with torch, the weights are ported
tensor-by-tensor (pose3d_tpu.compat), and a framework checkpoint directory
is written that cli/main.py and cli/infer.py consume directly.

Optimizer state is NOT ported (fresh AdamW moments on resume) — the
reference itself rebuilds the optimizer on architecture mismatch
(main.py:134-141).

Usage:
  python -m pose3d_tpu.cli.convert ref_model.pth out_checkpoint_dir
"""

from __future__ import annotations

import argparse
import logging

import jax
import numpy as np

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("Convert")


def convert(pth_path: str, out_dir: str, model_type: str = None) -> str:
    """Port a torch ``.pth`` to a framework checkpoint directory.

    Accepts the reference's self-describing format
    ({model_state_dict, model_args, model_type}, train.py:300-308) AND the
    degenerate forms its own infer CLI tolerates (infer.py:73-131): a bare
    state_dict (``model_type`` then comes from the argument, defaulting to
    "cnn" like the reference's ModelConfig) and ``module.`` DDP prefixes.
    """
    import torch

    from pose3d_tpu.compat import (
        port_reference_cnn,
        port_reference_transformer,
    )
    from pose3d_tpu.core.config import make_model_config
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    try:
        ckpt = torch.load(pth_path, map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints may embed non-tensor objects in model_args;
        # the file is user-supplied, same trust as the reference's own load
        ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    if hasattr(ckpt, "state_dict") and not isinstance(ckpt, dict):
        # torch.save(model) whole-module checkpoints (yolo_port handles
        # the same shape); architecture must come from the CLI
        ckpt = {k: v for k, v in ckpt.state_dict().items()}
    if not isinstance(ckpt, dict):
        raise ValueError(
            f"Unsupported checkpoint object {type(ckpt).__name__}: expected "
            "a dict (reference format or bare state_dict) or an nn.Module."
        )
    if "model_state_dict" in ckpt:
        raw_sd = ckpt["model_state_dict"]
        model_type = ckpt.get("model_type", model_type or "cnn")
        model_args = ckpt.get("model_args", {})
        step = int(ckpt.get("step", 0))
    elif ckpt and all(hasattr(v, "shape") for v in ckpt.values()):
        # bare state_dict (reference infer.py:84-92 fallback)
        raw_sd, model_args, step = ckpt, {}, 0
        model_type = model_type or "cnn"
        logger.info("Bare state_dict: assuming model_type=%s", model_type)
    else:
        raise ValueError(
            "Expected a reference checkpoint with 'model_state_dict' "
            "(train.py:300-308 format) or a bare state_dict."
        )
    sd = {k.replace("module.", ""): v for k, v in raw_sd.items()}

    cfg = make_model_config(model_type, **model_args)
    if model_type == "cnn":
        variables = port_reference_cnn(sd, cfg)
    else:
        variables = port_reference_transformer(sd, cfg)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    # fresh optimizer state around the ported weights
    model, init_vars = init_model(cfg, batch_size=1)
    state = create_train_state(model, {
        "params": variables["params"],
        "batch_stats": variables.get(
            "batch_stats", init_vars.get("batch_stats", {})
        ),
    })
    state = state.replace(step=jax.numpy.asarray(step, jax.numpy.int32))
    path = save_checkpoint(out_dir, state, model_type, cfg.to_dict())
    logger.info("Converted %s (step %d) -> %s", pth_path, step, path)
    return str(path)


def ensure_framework_checkpoint(path, model_type: str = None) -> str:
    """Accept either a framework checkpoint directory or a raw reference
    torch ``.pth`` — a reference user's checkpoint works with one command
    (reference infer.py loads .pth directly, infer.py:73-131). Torch files
    are converted once into a sibling ``<name>.jax/`` directory and reused
    while newer than the source file."""
    import os
    from pathlib import Path

    p = Path(path)
    if p.is_dir():
        return str(p)
    if not p.is_file():
        return str(p)  # let the checkpoint loader raise its usual error
    out = p.with_name(p.name + ".jax")
    # reuse only a COMPLETE conversion: meta.json is written last by
    # save_checkpoint, so its presence marks success (an interrupted
    # conversion leaves a partial dir that must be redone)
    if (out / "meta.json").is_file()             and out.stat().st_mtime >= p.stat().st_mtime:
        logger.info("Reusing converted checkpoint %s", out)
        return str(out)
    try:
        converted = convert(str(p), str(out), model_type=model_type)
    except PermissionError:  # read-only checkpoint directory
        import tempfile

        tmp = tempfile.mkdtemp(prefix="pose3d_ckpt_")
        converted = convert(str(p), tmp, model_type=model_type)
    os.utime(converted)  # mark fresher than the source .pth
    return str(converted)


def build_parser():
    p = argparse.ArgumentParser(
        description="Convert checkpoints between the reference's torch "
                    ".pth format and pose3d_tpu checkpoint directories "
                    "(default: .pth -> directory; --to-torch reverses)"
    )
    p.add_argument("src", metavar="pth", type=str,
                   help="source: a reference .pth (default direction) or a "
                        "framework checkpoint directory (--to-torch)")
    p.add_argument("out", type=str,
                   help="destination: checkpoint directory (default) or "
                        ".pth path (--to-torch)")
    p.add_argument("--model-type", type=str, default=None,
                   choices=["cnn", "transformer"],
                   help="Architecture for bare state_dicts that carry no "
                        "model_type (self-describing checkpoints ignore it)")
    p.add_argument("--to-torch", action="store_true",
                   help="Reverse direction: export a framework checkpoint "
                        "directory to a reference-format .pth (drop-in for "
                        "the reference's infer.py/main.py, incl. AdamW "
                        "moments for training resume)")
    p.add_argument("--ema", action="store_true",
                   help="--to-torch: export the EMA weights recorded by "
                        "--ema-decay training (omits optimizer state)")
    p.add_argument("--no-optimizer", action="store_true",
                   help="--to-torch: write momentum-free optimizer state")
    p.add_argument("--lr", type=float, default=None,
                   help="--to-torch: AdamW lr recorded in param_groups "
                        "(default 1e-3, reference config.py LEARNING_RATE)")
    p.add_argument("--weight-decay", type=float, default=None,
                   help="--to-torch: AdamW weight decay in param_groups "
                        "(default 0.01)")
    return p


def main(argv=None) -> int:
    # returns 0 so the console-script wrapper's sys.exit(main()) reports
    # success (returning the output path would exit 1)
    args = build_parser().parse_args(argv)
    if args.to_torch:
        from pose3d_tpu.compat_export import export_torch_checkpoint

        export_torch_checkpoint(
            args.src, args.out, ema=args.ema,
            lr=args.lr if args.lr is not None else 1e-3,
            weight_decay=(args.weight_decay
                          if args.weight_decay is not None else 0.01),
            include_optimizer=not args.no_optimizer,
        )
        return 0
    if args.ema or args.no_optimizer or args.lr is not None \
            or args.weight_decay is not None:
        raise SystemExit(
            "--ema/--no-optimizer/--lr/--weight-decay apply to "
            "--to-torch only"
        )
    convert(args.src, args.out, model_type=args.model_type)
    return 0


if __name__ == "__main__":
    main()
