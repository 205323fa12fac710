"""Training CLI — drop-in equivalent of the reference's ``main.py``.

Same flags (reference main.py:54-86) plus TPU-era extras; same flow:
seed → TensorBoard run dir → (resume from checkpoint: architecture rebuilt
from stored model_args, main.py:112-144) → streaming chunked datasets →
train_model with gradient accumulation / eval cadence / checkpoints.

Usage:
  python -m pose3d_tpu.cli.main --chunks-dir /data/chunks \
      --train-chunks 0 1 2 --val-chunks 3 --model-type cnn
"""

from __future__ import annotations

import argparse
import logging
import random
from datetime import datetime
from pathlib import Path

import jax
import numpy as np

from pose3d_tpu.core.config import GlobalConfig, make_model_config
from pose3d_tpu.core.mesh import make_data_mesh_for_batch
from pose3d_tpu.data import BatchLoader, StreamingChunkedDataset
from pose3d_tpu.models import init_model
from pose3d_tpu.ops.augment_device import (
    DeviceAugmentConfig,
    make_device_augment,
)
from pose3d_tpu.ops.losses import LossWeights
from pose3d_tpu.train import create_train_state, train_model
from pose3d_tpu.train.checkpoint import load_checkpoint_meta, restore_train_state

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    force=True,  # jax/absl may have installed handlers already
)
logger = logging.getLogger("Training")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train on streaming Human3.6M dataset (TPU)"
    )
    p.add_argument("--chunks-dir", type=str, required=True,
                   help="Directory containing chunked dataset")
    p.add_argument("--train-chunks", type=int, nargs="+",
                   help="Chunk indices to use for training")
    p.add_argument("--val-chunks", type=int, nargs="+",
                   help="Chunk indices to use for validation")
    p.add_argument("--cache-dir", type=str, default=None,
                   help="Directory to cache extracted chunks")
    p.add_argument("--chunk-io", choices=["auto", "stream", "extract"],
                   default="auto",
                   help="Chunk archive access: 'stream' inflates each "
                        "archive straight into memory (native chunkio, no "
                        "extract-to-disk), 'extract' uses the cache-dir "
                        "extraction, 'auto' streams but reuses an existing "
                        "extracted copy")
    p.add_argument("--pixel-dtype", choices=["uint8", "float32"],
                   default="uint8",
                   help="Host-pipeline pixel representation: 'uint8' "
                        "(default) keeps decoded pixels in byte form all "
                        "the way through the prefetch queue and the "
                        "host->device transfer (4x less host memory and "
                        "traffic; the [0,1]/metric decode runs on-device "
                        "and a host augmentor converts per-sample); "
                        "'float32' is the reference-shaped float decode")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Checkpoint path to load, or 'auto' to resume from "
                        "the newest checkpoint for this prefix/model-type "
                        "(fresh start when none exists — the idempotent "
                        "restart-after-preemption invocation)")
    p.add_argument("--start-step", type=int,
                   help="Global step index to resume from")
    p.add_argument("--no-resume-data", action="store_true",
                   help="When resuming from a checkpoint, do NOT fast-"
                        "forward the training data stream to the recorded "
                        "mid-epoch position (meta.json data_state); start "
                        "the stream from epoch 0 instead")
    p.add_argument("--keep-checkpoints", type=int, default=None,
                   help="Retain only the N newest checkpoints (the best-"
                        "by-val-MPJPE checkpoint is always kept). Default: "
                        "keep all, like the reference")
    p.add_argument("--profile-steps", type=int, default=None,
                   help="Capture a jax.profiler trace covering this many "
                        "optimizer steps (viewable in TensorBoard's profile "
                        "plugin). Off by default")
    p.add_argument("--profile-at", type=int, default=None,
                   help="Step AFTER which the profiler window opens "
                        "(default: start_step+5, past the layout-keyed "
                        "recompiles)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="Trace output dir (default: the run's TensorBoard "
                        "dir, or {checkpoint_prefix}_profile without TB)")
    p.add_argument("--memory-report", action="store_true",
                   help="Log XLA's compiled-program memory accounting "
                        "(argument/output/temp bytes) for the train step "
                        "before the first optimizer step")
    p.add_argument("--model-type", type=str,
                   choices=["cnn", "transformer"],
                   help="Model type: 'cnn' or 'transformer'")
    # TPU-era extras (defaults match the reference's config.py).
    p.add_argument("--num-steps", type=int, default=None,
                   help="Stop after this many optimizer steps")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--grad-accum", type=int, default=None)
    p.add_argument("--eval-interval", type=int, default=None)
    p.add_argument("--log-interval", type=int, default=10,
                   help="Fetch+log train metrics every N optimizer steps "
                        "(one packed device readback per window; per-step "
                        "fetching serializes the dispatch pipeline)")
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--lr-schedule", type=str, default="constant",
                   choices=["constant", "cosine", "linear"],
                   help="Learning-rate schedule (default: constant, the "
                        "reference's fixed LR). cosine/linear decay over "
                        "--schedule-steps (default --num-steps)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="Linear LR warmup steps (composes with any "
                        "--lr-schedule)")
    p.add_argument("--schedule-steps", type=int, default=None,
                   help="Decay horizon for cosine/linear schedules "
                        "(default: --num-steps)")
    p.add_argument("--min-lr-factor", type=float, default=0.0,
                   help="Final LR as a fraction of the peak for "
                        "cosine/linear schedules")
    p.add_argument("--clip-grad-norm", type=float, default=None,
                   help="Clip gradients to this global norm before AdamW "
                        "(off by default, like the reference)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="Maintain an exponential moving average of the "
                        "weights (e.g. 0.999); validation, previews and "
                        "best-checkpoint tracking use the averaged weights, "
                        "and checkpoints carry them (pose3d-eval --ema). "
                        "Off by default, like the reference")
    p.add_argument("--no-tensorboard", action="store_true",
                   help="Disable TensorBoard logging (skips TF import)")
    p.add_argument("--augment", action="store_true",
                   help="Enable data augmentation on the train set "
                        "(host-side, reference-parity path)")
    p.add_argument("--augment-device", action="store_true",
                   help="Run augmentation ON DEVICE inside the jitted "
                        "train step (ops/augment_device): flip/scale/"
                        "translate as batched MXU interpolation matmuls "
                        "+ color jitter, no host CPU cost. Rotation is "
                        "OFF in this profile (its scattered-gather "
                        "resample is pathologically slow on TPU — see "
                        "the module docstring); enable it with "
                        "--augment-device-rotation or use host-side "
                        "--augment for the full reference chain")
    p.add_argument("--augment-device-rotation", action="store_true",
                   help="Include rotation in --augment-device (gather "
                        "path; measured ~13x step slowdown on the dev "
                        "chip at the full 500px config)")
    p.add_argument("--absolute-pose", action="store_true",
                   help="Train on absolute camera-space joints (DEP-P) "
                        "instead of root-relative (IND-P)")
    p.add_argument("--freeze-backbone", action="store_true",
                   help="Freeze the ViT backbone except the adapted "
                        "patch-embed (transformer only)")
    p.add_argument("--attention-backend", type=str, default="pallas",
                   choices=["pallas", "xla"],
                   help="Attention kernel for the transformer model")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize backbone blocks in the backward "
                        "pass (both model types): lowers peak HBM at a "
                        "throughput cost — the escape hatch when a "
                        "composition of options pushes past the chip's "
                        "memory (check with --memory-report)")
    p.add_argument("--accum-mode", type=str, default="grouped",
                   choices=["ghost", "grouped", "scan"],
                   help="Gradient accumulation: 'grouped' (default) "
                        "computes per-microbatch ghost-BN statistics "
                        "inside each BatchNorm call on one flat batch "
                        "(fastest — 278 vs 161 img/s over 'scan' on chip; "
                        "dropout masks iid-equivalent, not bitwise); "
                        "'ghost' vmaps the model over microbatches "
                        "(bit-exact dropout parity with 'scan' — "
                        "tests/test_ghost_accum.py); 'scan' runs them "
                        "sequentially (lowest peak activation memory)")
    p.add_argument("--param-sharding", type=str, default="replicated",
                   choices=["replicated", "fsdp"],
                   help="TrainState placement over the device mesh: "
                        "'replicated' (pure data parallelism) or 'fsdp' "
                        "(ZeRO-3 — params and optimizer moments sharded "
                        "over the data axis, ~mesh-size× lower param "
                        "memory per chip; parallel/fsdp.py)")
    p.add_argument("--multislice", action="store_true",
                   help="Build a hybrid (replica × data) mesh grouping "
                        "devices by TPU slice: the batch shards over both "
                        "axes, FSDP/param collectives stay within a slice "
                        "on ICI, and only the per-step gradient all-reduce "
                        "crosses DCN (core/mesh.make_hybrid_mesh). "
                        "Requires a multi-slice runtime (devices expose "
                        "slice_index; single-slice degenerates to the "
                        "plain data mesh).")
    p.add_argument("--vit-weights", type=str, default=None,
                   help="Pretrained timm-format ViT weights "
                        "(.pth/.safetensors, vit_base_patch16_384 family) "
                        "to initialize the transformer backbone — the "
                        "reference builds its ViT from pretrained timm "
                        "weights (src/models/transformers.py:174-179). "
                        "Ignored when resuming from a checkpoint.")
    p.add_argument("--model-args", type=str, default=None,
                   help="JSON dict of model-config overrides (same keys as "
                        "checkpoint model_args)")
    p.add_argument("--compat-pa-metric", action="store_true",
                   help="Report PA-MPJPE with the reference's transposed-"
                        "rotation convention instead of true Procrustes")
    # Multi-host SPMD (optional; single-process when omitted).
    p.add_argument("--coordinator", type=str, default=None,
                   help="Coordinator address for jax.distributed.initialize")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None):
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.augment_device_rotation and not args.augment_device:
        parser.error("--augment-device-rotation requires --augment-device")
    if args.augment and args.augment_device:
        parser.error("--augment (host) and --augment-device are mutually "
                     "exclusive — pick one augmentation path")
    cfg = GlobalConfig()

    from pose3d_tpu.core.mesh import (
        host_shard_info,
        initialize_distributed,
        warmup_collectives,
    )

    initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    shard_id, num_shards = host_shard_info()
    if num_shards > 1:
        # bring the cross-host collectives context up NOW, while the
        # processes are in lockstep from the init barrier — the lazy
        # first-collective handshake has a short deadline that per-host
        # compile-time skew can blow (see core/mesh.warmup_collectives)
        total = warmup_collectives()
        logger.info("Collectives warm: %d devices across %d hosts",
                    int(total), num_shards)

    np.random.seed(cfg.random_seed)
    random.seed(cfg.random_seed)

    # `is not None`, not truthiness: an explicit 0 (e.g. --learning-rate 0
    # for a frozen debugging pass) must not silently become the default.
    def _or(v, default):
        return v if v is not None else default

    batch_size = _or(args.batch_size, cfg.batch_size)
    accum = _or(args.grad_accum, cfg.gradient_accumulation_steps)
    eval_interval = _or(args.eval_interval, cfg.eval_interval)
    lr = _or(args.learning_rate, cfg.learning_rate)

    cache_dir = Path(args.cache_dir) if args.cache_dir else None
    if cache_dir:
        cache_dir.mkdir(parents=True, exist_ok=True)

    if args.no_tensorboard or jax.process_index() != 0:
        # non-primary hosts write no TB streams (multi-host hygiene;
        # checkpoints are gated the same way inside train_model)
        from pose3d_tpu.train.tb import NullWriter

        writer = NullWriter()
    else:
        from pose3d_tpu.train.tb import SummaryWriter

        log_dir = Path(cfg.log_dir) / datetime.now().strftime("%Y%m%d-%H%M%S")
        writer = SummaryWriter(log_dir)
        logger.info("TensorBoard logs: %s", log_dir)

    model_type = (args.model_type or cfg.model_type).lower()
    start_step = 0

    if args.checkpoint == "auto":
        # auto-resume: newest checkpoint for this prefix/model_type —
        # a preempted job restarted with the SAME command line resumes
        # itself (pairs with the SIGTERM checkpoint-and-exit path)
        from pose3d_tpu.train.checkpoint import latest_checkpoint

        found = latest_checkpoint(cfg.checkpoint_prefix, model_type)
        if found is not None:
            args.checkpoint = str(found)
            logger.info("Auto-resume: found %s", found)
        else:
            args.checkpoint = None
            logger.info("Auto-resume: no checkpoint found — fresh start")

    # Resume path: architecture from checkpoint metadata
    # (reference main.py:112-144 contract).
    model_args = {}
    if args.model_args:
        import json

        model_args = json.loads(args.model_args)
    data_state = None
    if args.checkpoint and Path(args.checkpoint).exists():
        # checkpoint model_args take precedence (reference main.py:103,116).
        meta = load_checkpoint_meta(args.checkpoint)
        model_type = meta.get("model_type", model_type)
        model_args = {**model_args, **meta.get("model_args", {})}
        start_step = meta.get("step", 0)
        if not args.no_resume_data:
            data_state = meta.get("data_state")
        logger.info("Resuming %s from %s at step %d",
                    model_type, args.checkpoint, start_step)
        if data_state:
            logger.info(
                "Resuming data stream mid-epoch: epoch %d, %d samples "
                "consumed (--no-resume-data disables)",
                data_state["epoch"], data_state["samples_consumed"],
            )

    model_cfg = make_model_config(model_type, **model_args)
    model, variables = init_model(
        model_cfg, batch_size=batch_size,
        attention_backend=args.attention_backend,
        **({"remat": True} if args.remat else {}),
    )
    if args.vit_weights:
        if model_type != "transformer":
            raise SystemExit("--vit-weights only applies to the "
                             "transformer model")
        if args.checkpoint and Path(args.checkpoint).exists():
            logger.warning("--vit-weights ignored: checkpoint %s carries "
                           "the full backbone state", args.checkpoint)
        else:
            # reference transformers.py:174-224: timm pretrained ViT with
            # 3→4ch patch-embed inflation + pos-embed interpolation.
            from pose3d_tpu.stage1.port import (
                load_torch_state_dict,
                merge_params,
                port_vit_backbone,
            )

            sd = load_torch_state_dict(args.vit_weights)
            n_patches = (
                (model_cfg.image_size[0] // model_cfg.vit_patch_size)
                * (model_cfg.image_size[1] // model_cfg.vit_patch_size)
            )
            ported = port_vit_backbone(
                sd, num_heads=model_cfg.vit_heads,
                depth=model_cfg.vit_depth,
                in_channels=model_cfg.image_in_channels,
                num_patches=n_patches,
            )
            variables = merge_params(variables, ported, "vit_backbone")
            logger.info("Initialized ViT backbone from %s",
                        args.vit_weights)
    freeze_kw = {}
    if args.freeze_backbone and model_type == "transformer":
        # reference src/models/transformers.py:226-236: freeze the ViT but
        # keep the channel-adapted patch embed trainable.
        freeze_kw = dict(
            frozen_prefixes=("vit_backbone",),
            trainable_exceptions=("vit_backbone/patch_embed",),
        )
    from pose3d_tpu.train.state import make_lr_schedule

    lr_or_schedule = make_lr_schedule(
        lr, schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        decay_steps=args.schedule_steps or args.num_steps,
        end_lr_factor=args.min_lr_factor,
    )
    state = create_train_state(
        model, variables, learning_rate=lr_or_schedule,
        weight_decay=cfg.weight_decay,
        clip_grad_norm=args.clip_grad_norm,
        ema=args.ema_decay is not None,
        **freeze_kw,
    )
    if args.checkpoint and Path(args.checkpoint).exists():
        state, _ = restore_train_state(state, args.checkpoint)
        if args.ema_decay is not None:
            from pose3d_tpu.train.checkpoint import checkpoint_has_ema

            if not checkpoint_has_ema(args.checkpoint):
                # EMA enabled on a pre-EMA checkpoint: the mirror was
                # seeded from the RANDOM init by create_train_state and
                # restore left it there — validation/best-tracking would
                # run on noise-dominated averages for ~1/(1-decay)
                # steps. Seed it from the restored weights instead.
                logger.info(
                    "Checkpoint has no EMA weights — seeding the EMA "
                    "mirror from the restored parameters."
                )
                state = state.replace(
                    ema_params=jax.tree_util.tree_map(
                        lambda x: x.copy(), state.params
                    ),
                    ema_batch_stats=jax.tree_util.tree_map(
                        lambda x: x.copy(), state.batch_stats
                    ),
                )
        # (The inverse — resuming an EMA checkpoint without --ema-decay —
        # is safe by construction: restore only fills ema_params when the
        # state carries the slot, so new checkpoints won't claim EMA.)
    elif args.checkpoint:
        logger.warning("Checkpoint not found: %s, training from scratch.",
                       args.checkpoint)

    if args.start_step is not None:
        start_step = args.start_step

    if args.multislice:
        from pose3d_tpu.core.mesh import make_hybrid_mesh

        if not any(
            getattr(d, "slice_index", None) is not None for d in jax.devices()
        ):
            # Without slice_index the default slice_key groups by
            # process_index, so on a multi-host single-slice pod the
            # "replica" axis would label intra-slice ICI as DCN — numerically
            # fine, but not the multi-slice topology the flag promises.
            logger.warning(
                "--multislice: no device exposes slice_index; grouping by "
                "process index instead — the 'replica' axis may not "
                "correspond to DCN links on this runtime."
            )
        mesh = make_hybrid_mesh()
        total = mesh.shape["replica"] * mesh.shape["data"]
        if batch_size % total:
            raise SystemExit(
                f"--multislice: batch size {batch_size} not divisible by "
                f"the {total}-device hybrid mesh"
            )
    else:
        mesh = make_data_mesh_for_batch(batch_size)
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    logger.info("Devices: %s", jax.devices())
    logger.info("Mesh: %s", mesh)
    logger.info("Model type: %s (%.1fM params)", model_type, n_params / 1e6)
    # Model summary to TensorBoard — the role the reference's
    # torch.jit.trace + add_graph played (main.py:215-224).
    try:
        import flax.linen as nn

        from pose3d_tpu.models.factory import dummy_inputs

        summary = nn.tabulate(
            model, jax.random.PRNGKey(0),
            compute_flops=False, compute_vjp_flops=False, depth=2,
        )(*dummy_inputs(model_cfg, 1), train=False)
        writer.add_text("Model/summary", f"```\n{summary}\n```")
    except Exception:
        logger.exception("Could not add model summary to TensorBoard")
    logger.info("Effective batch size: %d", batch_size * accum)
    logger.info("Resume from step: %d", start_step)

    image_size = tuple(model_cfg.image_size)
    root_relative = not args.absolute_pose
    train_ds = StreamingChunkedDataset(
        "train", args.chunks_dir, chunk_indices=args.train_chunks,
        image_size=image_size, cache_dir=cache_dir,
        use_augmentation=(
            not args.augment_device
            and (args.augment or cfg.use_augmentation)
        ),
        shuffle=True, shuffle_chunks=True, root_relative=root_relative,
        shard_id=shard_id, num_shards=num_shards, chunk_io=args.chunk_io,
        pixel_dtype=args.pixel_dtype,
    )
    train_ds.training = True
    if data_state:
        train_ds.set_epoch(int(data_state["epoch"]))
        train_ds.skip_next_samples(int(data_state["samples_consumed"]))
    # Val is deliberately NOT host-sharded: under the global SPMD mesh
    # every process must issue the IDENTICAL sequence of eval_step calls
    # (they carry cross-host collectives), and with a streaming dataset
    # of unknown per-host cardinality, host-sharding cannot guarantee
    # equal batch counts — unequal counts deadlock the pod at the first
    # full validation. Instead every host decodes the same full val set
    # (identical seeded shuffle) and feeds its addressable slice of each
    # identical global batch; metrics come out replicated and correct.
    # The only cost is duplicated host-side decode of the val set.
    val_ds = StreamingChunkedDataset(
        "test", args.chunks_dir, chunk_indices=args.val_chunks,
        image_size=image_size, cache_dir=cache_dir,
        shuffle=True, shuffle_chunks=True, root_relative=root_relative,
        chunk_io=args.chunk_io, pixel_dtype=args.pixel_dtype,
    )
    train_loader = BatchLoader(train_ds, batch_size, loop=True)
    val_loader = BatchLoader(val_ds, batch_size, drop_last=False)

    weights = LossWeights(
        mse=cfg.mse_loss_weight, l1=cfg.l1_loss_weight,
        inter_joint=cfg.inter_joint_loss_weight,
        abs_root=cfg.abs_root_loss_weight,
    )

    # Preemption safety: SIGTERM (the TPU-pod eviction signal) requests a
    # graceful stop — finish the in-flight step, checkpoint with the data
    # position, exit 0. SIGINT keeps its KeyboardInterrupt path (same
    # checkpoint-on-exit guarantee inside train_model's finally).
    import signal
    import threading

    stop_event = threading.Event()

    def _on_sigterm(signum, frame):
        logger.warning(
            "SIGTERM received — will checkpoint and exit after the "
            "current optimizer step."
        )
        stop_event.set()

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (e.g. embedded use) — skip the handler

    state, last_step = train_model(
        state, model_type, train_loader, val_loader,
        model=model, model_args=model_cfg.to_dict(), mesh=mesh,
        writer=writer, loss_weights=weights,
        gradient_accumulation_steps=accum,
        start_step=start_step, num_steps=args.num_steps,
        eval_interval_steps=eval_interval,
        checkpoint_prefix=cfg.checkpoint_prefix,
        preview_interval_steps=cfg.preview_interval,
        log_interval_steps=args.log_interval,
        rng=jax.random.PRNGKey(cfg.random_seed),
        compat_pa_metric=args.compat_pa_metric,
        accum_mode=args.accum_mode,
        param_sharding=args.param_sharding,
        data_state=data_state,
        stop_event=stop_event,
        keep_checkpoints=args.keep_checkpoints,
        memory_report=args.memory_report,
        ema_decay=args.ema_decay,
        lr_schedule=lr_or_schedule if callable(lr_or_schedule) else None,
        profile=(
            (
                args.profile_at if args.profile_at is not None
                else start_step + 5,
                args.profile_steps,
                args.profile_dir or (
                    str(log_dir) if not args.no_tensorboard
                    and jax.process_index() == 0
                    else f"{cfg.checkpoint_prefix}_profile"
                ),
            )
            if args.profile_steps else None
        ),
        augment=(
            make_device_augment(DeviceAugmentConfig(
                enable_rotation=args.augment_device_rotation,
            ))
            if args.augment_device else None
        ),
    )
    logger.info("Training complete at step %d", last_step)
    writer.close()
    return last_step


def cli(argv=None) -> int:
    """Console-script entry (pyproject [project.scripts]): the wrapper
    calls ``sys.exit(cli())``, so return 0 — ``main``'s informative
    return value (the last optimizer step) would otherwise become the exit status and a
    successful run would report failure."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
