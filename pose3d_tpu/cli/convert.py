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


def convert(pth_path: str, out_dir: str) -> str:
    import torch

    from pose3d_tpu.compat import (
        port_reference_cnn,
        port_reference_transformer,
    )
    from pose3d_tpu.core.config import make_model_config
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    if "model_state_dict" not in ckpt:
        raise ValueError(
            "Expected a reference checkpoint with 'model_state_dict' "
            "(train.py:300-308 format)."
        )
    model_type = ckpt.get("model_type", "cnn")
    model_args = ckpt.get("model_args", {})
    step = int(ckpt.get("step", 0))
    sd = {k.replace("module.", ""): v
          for k, v in ckpt["model_state_dict"].items()}

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


def build_parser():
    p = argparse.ArgumentParser(
        description="Convert a reference torch .pth checkpoint to a "
                    "pose3d_tpu checkpoint directory"
    )
    p.add_argument("pth", type=str)
    p.add_argument("out", type=str)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return convert(args.pth, args.out)


if __name__ == "__main__":
    main()
