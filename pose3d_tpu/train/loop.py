"""Training orchestration.

Behavior parity with the reference trainer (src/train.py:13-320):
  * optimizer step every ``gradient_accumulation_steps`` raw batches —
    realized as one jitted superbatch step (see step.py);
  * TensorBoard scalars Loss/train_step + Loss_Components/* per optimizer
    step (train.py:124-139);
  * validation preview image every ``preview_interval_steps`` (train.py:147-189);
  * full validation (loss components, MPJPE, PA-MPJPE) + checkpoint every
    ``eval_interval_steps`` (train.py:192-309);
  * ``num_steps=None`` trains until the data runs out for ``max_epochs``
    epochs (the reference trains forever; capped here for safety).

Returns ``(state, global_step)`` — two values; the reference's
``main.py:227`` unpacks three from two, crashing after training completes
(SURVEY.md §2 known quirk), which this framework deliberately fixes.
"""

from __future__ import annotations

import itertools
import logging
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from pose3d_tpu.ops.losses import LossWeights
from pose3d_tpu.train.checkpoint import save_checkpoint
from pose3d_tpu.train.step import make_eval_step, make_train_step
from pose3d_tpu.train.tb import NullWriter

logger = logging.getLogger("pose3d_tpu.train")


def _superbatches(loader: Iterable[Dict], accum: int, compact: bool = True):
    """Group raw batches into [A, B, ...] superbatches (drop ragged tail).

    ``compact=True`` re-encodes pixels as uint8 + per-sample depth scale
    (data.collate.compact_batch) so the host→device transfer carries
    1 byte/pixel; the train/eval steps decode on-device."""
    from pose3d_tpu.data.collate import compact_batch

    it = iter(loader)
    keys = ("image", "depth", "keypoints_2d", "joints_3d", "depth_scale")
    while True:
        group = list(itertools.islice(it, accum))
        if len(group) < accum:
            return
        if compact:
            group = [compact_batch(g) for g in group]
        out = {
            k: np.stack([g[k] for g in group])
            for k in keys if k in group[0]
        }
        # Data-stream position of the LAST microbatch (host-only metadata
        # from BatchLoader, for deterministic mid-epoch resume): consuming
        # this superbatch advances the stream to exactly this position —
        # correct even when the group straddles an epoch boundary under
        # BatchLoader(loop=True).
        if "_pos" in group[-1]:
            out["_pos"] = group[-1]["_pos"]
        yield out


def _device_prefetch(iterator, mesh, depth: int = 2):
    """Double-buffered host→device feed: device_put (async) for up to
    ``depth`` superbatches ahead of the consumer, with the superbatch
    microbatch axis replicated and the batch axis sharded over the mesh
    ``data`` axis. This overlaps the host→HBM transfer of batch N+1 with
    the computation of batch N — the role pin_memory/non_blocking played
    in the reference (main.py:188-189)."""
    import collections

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _sh(v):
            from pose3d_tpu.core.mesh import batch_spec_entry

            return NamedSharding(
                mesh,
                P(*([None, batch_spec_entry(mesh)] + [None] * (v.ndim - 2))),
            )

        if jax.process_count() > 1:
            # Multi-host: each process feeds its OWN (host-sharded, hence
            # different) local batch. jax.device_put with a global sharding
            # asserts value-equality across processes — the correct
            # assembly is make_array_from_process_local_data, which treats
            # each host's batch as that host's shard of a global batch of
            # size per_host_batch x process_count (found by the real
            # 2-process test, tests/test_distributed_2proc.py).
            def put(b):
                return {
                    k: v if k.startswith("_")
                    else jax.make_array_from_process_local_data(_sh(v), v)
                    for k, v in b.items()
                }
        else:
            def put(b):
                return {
                    k: v if k.startswith("_")
                    else jax.device_put(v, _sh(v))
                    for k, v in b.items()
                }
    else:
        def put(b):
            host = {k: v for k, v in b.items() if k.startswith("_")}
            dev = jax.device_put(
                {k: v for k, v in b.items() if not k.startswith("_")}
            )
            return {**dev, **host}

    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def _global_val_batch(db, mesh):
    """Lift a host-local validation batch onto the global mesh.

    Validation is REPLICATED by contract (every process feeds the
    identical stream, cli/main.py), but under multi-process jit refuses
    to auto-shard host numpy inputs against the eval step's P("data")
    in_sharding. Every host holds the full batch, so each can serve any
    index — make_array_from_callback assembles the same global batch a
    single process would get (found by the real 2-process test,
    tests/test_distributed_2proc.py). Single-process: no-op (jit's own
    auto-put is fine and cheaper)."""
    if mesh is None or jax.process_count() == 1:
        return db
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pose3d_tpu.core.mesh import batch_spec_entry

    out = {}
    for k, v in db.items():
        arr = np.asarray(v)
        sh = NamedSharding(mesh, P(batch_spec_entry(mesh)))
        out[k] = jax.make_array_from_callback(
            arr.shape, sh, lambda idx, a=arr: a[idx]
        )
    return out


def evaluate(eval_step, state, val_loader,
             pad_to: Optional[int] = None,
             per_action: bool = False, mesh=None) -> Dict[str, float]:
    """Full validation pass: sample-weighted averages of loss components,
    MPJPE and PA-MPJPE (reference src/train.py:203-277).

    ``eval_step`` must be per-sample (make_eval_step(per_sample=True));
    ragged final batches are padded to ``pad_to`` (static shapes, no
    recompile) and the padding is masked out of the averages — exact
    metrics over the full set. Multi-host note: validation must be
    REPLICATED (every process feeds the identical val stream, as
    cli/main.py arranges) — the sums here are host-local with no
    cross-host combine, and host-sharding a streaming val set cannot
    guarantee the equal per-host batch counts SPMD collectives need.

    ``per_action`` additionally buckets MPJPE/PA-MPJPE by each batch's
    ``action`` metadata (the standard H3.6M per-action protocol — the
    reference reports only the overall mean); the result gains a
    ``"per_action"`` dict {action: {mpjpe, pa_mpjpe, count}}."""
    totals: Dict[str, float] = {}
    count = 0
    action_totals: Dict[str, Dict[str, float]] = {}
    for batch in val_loader:
        bs = batch["image"].shape[0]
        # depth_scale rides along for uint8-pixel batches (the on-device
        # decode in the eval step needs it to rescale depth to metric).
        db = {
            k: batch[k]
            for k in ("image", "depth", "keypoints_2d", "joints_3d",
                      "depth_scale")
            if k in batch
        }
        if pad_to is not None and bs < pad_to:
            db = {
                k: np.concatenate(
                    [v, np.repeat(v[:1], pad_to - bs, axis=0)]
                )
                for k, v in db.items()
            }
        metrics, _ = eval_step(state, _global_val_batch(db, mesh))
        metrics = {k: np.asarray(v) for k, v in jax.device_get(metrics).items()}
        for k, v in metrics.items():
            totals[k] = totals.get(k, 0.0) + float(v[:bs].sum())
        count += bs
        if per_action and batch.get("action") is not None:
            for i in range(bs):
                if batch["action"][i] is None:
                    # collate always emits the action list; chunks without
                    # action metadata must not create a bogus "None" bucket
                    continue
                a = str(batch["action"][i])
                acc = action_totals.setdefault(
                    a, {"mpjpe": 0.0, "pa_mpjpe": 0.0, "count": 0}
                )
                acc["mpjpe"] += float(metrics["mpjpe"][i])
                acc["pa_mpjpe"] += float(metrics["pa_mpjpe"][i])
                acc["count"] += 1
    if count == 0:
        # A misconfigured --val-chunks must not silently degrade to
        # "no validation" (round-1 finding).
        raise RuntimeError(
            "Validation loader yielded no batches — check --val-chunks / "
            "--chunks-dir (empty validation would otherwise be silent)."
        )
    out = {k: v / count for k, v in totals.items()}
    if per_action:
        out["per_action"] = {
            a: {
                "mpjpe": acc["mpjpe"] / acc["count"],
                "pa_mpjpe": acc["pa_mpjpe"] / acc["count"],
                "count": acc["count"],
            }
            for a, acc in sorted(action_totals.items())
        }
    return out


def train_model(
    state,
    model_type: str,
    train_loader,
    val_loader=None,
    *,
    model=None,
    model_args: Optional[Dict] = None,
    mesh=None,
    writer=None,
    loss_weights: LossWeights = LossWeights(),
    gradient_accumulation_steps: int = 1,
    start_step: int = 0,
    num_steps: Optional[int] = None,
    eval_interval_steps: int = 5000,
    checkpoint_prefix: str = "checkpoint",
    preview_interval_steps: int = 50,
    log_interval_steps: int = 10,
    max_epochs: int = 10_000,
    rng: Optional[jax.Array] = None,
    compat_pa_metric: bool = False,
    accum_mode: str = "grouped",
    augment=None,
    param_sharding: str = "replicated",
    data_state: Optional[Dict] = None,
    stop_event=None,
    keep_checkpoints: Optional[int] = None,
    profile: Optional[tuple] = None,
    ema_decay: Optional[float] = None,
    lr_schedule=None,
    memory_report: bool = False,
):
    """Train ``state`` over ``train_loader``; returns (state, global_step).

    Metrics are fetched from the device every ``log_interval_steps``
    optimizer steps in ONE packed readback rather than per step: through
    this environment's remote-TPU tunnel a per-step device_get costs tens
    of milliseconds and serializes the dispatch pipeline (round-1 finding —
    the gap between 258 img/s device capability and 36 img/s end-to-end).
    TB still receives one scalar per step, written in batches.

    ``data_state`` {epoch, samples_consumed} seeds the data-stream position
    bookkeeping on resume (the caller fast-forwards the dataset itself via
    StreamingChunkedDataset.set_epoch/skip_next_samples); every checkpoint
    records the position reached, so training resumes mid-epoch on the
    exact next sample. ``stop_event`` (threading.Event) requests a graceful
    stop: the loop finishes the in-flight optimizer step, checkpoints
    (including the data position), and returns — the preemption story for
    TPU pods (SIGTERM is wired to this in cli/main). ``keep_checkpoints``
    enables retention of only the N newest checkpoints (the recorded
    best-by-val-MPJPE checkpoint is always protected).

    ``profile`` (start_at_step, num_steps, log_dir) captures a
    ``jax.profiler`` xplane trace of optimizer steps start_at+1..start_at+N
    into ``log_dir`` (viewable in TensorBoard's profile plugin or via
    utils/profiling.summarize_trace — aggregate the serialized 'XLA Ops'
    line only, docs/ROUND3.md). The window forces one device readback at
    its end so the async dispatch queue drains inside the trace.

    ``ema_decay`` maintains an EMA of the params inside the train step
    (requires create_train_state(ema=True)); validation, previews and
    best-checkpoint tracking then run on the averaged weights.

    ``lr_schedule``: optional step->lr callable (state.make_lr_schedule);
    logged to TensorBoard as Train/learning_rate alongside each metric
    flush so scheduled runs show their actual LR curve."""
    import time

    import jax.numpy as jnp

    writer = writer or NullWriter()
    rng = rng if rng is not None else jax.random.PRNGKey(42)
    model_args = model_args or {}
    # Multi-host hygiene: only process 0 writes checkpoints (cli/main.py
    # already routes non-primary hosts to a NullWriter) — on a pod every
    # process would otherwise save into the same directory concurrently.
    # Exception: an FSDP-sharded state has no host holding the full
    # arrays, so its checkpoint save is COLLECTIVE (every process calls
    # save_checkpoint; orbax has each host write its addressable shards).
    is_primary = jax.process_index() == 0

    if param_sharding == "fsdp" and mesh is not None:
        # ZeRO-3: params + optimizer moments sharded over the data axis
        # (parallel/fsdp.py); GSPMD all-gathers at use, reduce-scatters
        # grads, and the state_like pin keeps the returned state sharded.
        from pose3d_tpu.parallel import shard_state_for_fsdp

        state = shard_state_for_fsdp(state, mesh)
        train_step = make_train_step(
            model, loss_weights, mesh=mesh, accum_mode=accum_mode,
            augment=augment, state_sharding="auto", state_like=state,
            ema_decay=ema_decay,
        )
    else:
        if param_sharding == "fsdp":
            logger.warning(
                "param_sharding='fsdp' requires a mesh; training with "
                "replicated parameters instead."
            )
        train_step = make_train_step(model, loss_weights, mesh=mesh,
                                     accum_mode=accum_mode, augment=augment,
                                     ema_decay=ema_decay)
    # Sharded (FSDP) state on a multi-process runtime: checkpoint saves are
    # collective (every process writes its shards) — computed AFTER the
    # sharding above so it reflects the state actually being saved.
    from pose3d_tpu.train.checkpoint import state_needs_collective_checkpoint

    saves_ckpt = is_primary or state_needs_collective_checkpoint(state)

    # Validation/preview/best-tracking run on the EMA weights when enabled.
    from pose3d_tpu.train.state import with_ema_params

    eval_view = with_ema_params if ema_decay is not None else (lambda s: s)
    eval_step = make_eval_step(
        model, loss_weights, mesh=mesh, compat_pa=compat_pa_metric,
        per_sample=True,
        state_sharding=(
            "auto" if param_sharding == "fsdp" and mesh is not None
            else "replicated"
        ),
    )

    global_step = start_step
    last_ckpt_step = start_step
    target = num_steps if num_steps is not None else float("inf")
    # Data-stream position (epoch, samples consumed in it) — updated per
    # optimizer step from the loader-attached batch positions, persisted in
    # every checkpoint's meta.json for deterministic mid-epoch resume.
    last_pos = None
    if data_state:
        last_pos = (
            int(data_state["epoch"]), int(data_state["samples_consumed"])
        )

    def _ckpt_meta():
        if last_pos is None:
            return None
        return {"data_state": {
            "epoch": last_pos[0], "samples_consumed": last_pos[1],
        }}
    val_preview_iter = iter(val_loader) if val_loader is not None else None

    # --- batched async metric logging -----------------------------------
    metric_keys: list = []

    @jax.jit
    def _pack_metrics(ms):
        return jnp.stack(
            [jnp.stack([m[k] for k in metric_keys]) for m in ms]
        ).astype(jnp.float32)

    pending_steps: list = []
    pending_metrics: list = []
    pending_images = 0
    flushes = 0
    window_t0 = time.perf_counter()

    def _flush_metrics() -> Optional[Dict[str, float]]:
        nonlocal pending_images, window_t0, flushes
        if not pending_metrics:
            return None
        if not metric_keys:
            metric_keys.extend(sorted(pending_metrics[0].keys()))
        # Pad the window to its maximum length so _pack_metrics traces
        # ONCE — jit keys on the list length, and preview/eval-boundary
        # flushes produce short windows that would otherwise each compile
        # a fresh program on the tunneled TPU.
        n = len(pending_metrics)
        padded = pending_metrics + [pending_metrics[-1]] * (
            max(log_interval_steps, n) - n
        )
        vals = np.asarray(_pack_metrics(padded))[:n]  # one readback
        dt = time.perf_counter() - window_t0
        for i, step_i in enumerate(pending_steps):
            writer.add_scalar(
                "Loss/train_step",
                float(vals[i, metric_keys.index("total_loss")]), step_i,
            )
            for j, k in enumerate(metric_keys):
                writer.add_scalar(
                    f"Loss_Components/{k}", float(vals[i, j]), step_i
                )
        if lr_schedule is not None:
            writer.add_scalar(
                "Train/learning_rate",
                float(lr_schedule(pending_steps[-1])), pending_steps[-1],
            )
        flushes += 1
        if flushes > 1:  # first window contains jit/layout compiles
            n = len(pending_steps)
            writer.add_scalar(
                "Perf/step_time_ms", dt / n * 1e3, pending_steps[-1]
            )
            writer.add_scalar(
                "Perf/images_per_sec", pending_images / dt, pending_steps[-1]
            )
        last = {
            k: float(vals[-1, j]) for j, k in enumerate(metric_keys)
        }
        # Console progress (the reference logs each step's loss to the
        # terminal, train.py:124-139; TB-only metrics left a silent CLI).
        # First window includes jit/layout compiles — no rate reported.
        rate = (
            f", {pending_images / dt:.1f} img/s" if flushes > 1 else ""
        )
        logger.info(
            "Step %d: loss %.4f%s", pending_steps[-1],
            last.get("total_loss", float("nan")), rate,
        )
        pending_steps.clear()
        pending_metrics.clear()
        pending_images = 0
        window_t0 = time.perf_counter()
        return last

    prof = None
    if profile is not None:
        prof_at, prof_n, prof_dir = profile
        prof = {"at": int(prof_at), "until": int(prof_at) + int(prof_n),
                "dir": str(prof_dir), "active": False}

    # Multi-process: the stop decision must be COLLECTIVE. Signals land on
    # each host independently, so a stop observed locally at different loop
    # positions would have the hosts checkpoint at DIFFERENT steps — for a
    # sharded (FSDP) state that is two different all-process orbax
    # barriers, i.e. a distributed hang at shutdown (review finding). One
    # tiny allgather per optimizer step (multi-process only, every host at
    # the same loop position) makes "any host saw the signal" the shared
    # decision, so every host exits at the same global_step. (SIGINT /
    # KeyboardInterrupt stays host-local and inherently unsynchronized —
    # SIGTERM is the supported pod-preemption path, cli/main.py.)
    if stop_event is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def _stop_requested():
            flag = np.float32(1.0 if stop_event.is_set() else 0.0)
            return bool(multihost_utils.process_allgather(flag).max() > 0)
    else:
        def _stop_requested():
            return stop_event is not None and stop_event.is_set()

    stopped = False
    try:
        for _epoch in range(max_epochs):
            if global_step >= target or stopped:
                break
            for superbatch in _device_prefetch(
                _superbatches(train_loader, gradient_accumulation_steps), mesh
            ):
                if global_step >= target or stopped:
                    break
                if _stop_requested():
                    logger.warning(
                        "Graceful stop requested — checkpointing at step %d "
                        "and exiting.", global_step,
                    )
                    stopped = True
                    break
                pos = superbatch.pop("_pos", None)
                if prof and not prof["active"] and global_step == prof["at"]:
                    logger.info(
                        "Starting profiler trace (steps %d..%d) -> %s",
                        prof["at"] + 1, prof["until"], prof["dir"],
                    )
                    jax.profiler.start_trace(prof["dir"])
                    prof["active"] = True
                step_rng = jax.random.fold_in(rng, global_step)
                if memory_report:
                    # One AOT lowering at the real shapes BEFORE the first
                    # step: XLA's own argument/output/temp accounting —
                    # says whether the config fits in HBM without waiting
                    # for a compile-and-OOM. Shares the jit cache, so the
                    # step call below is a cache hit, not a recompile.
                    from pose3d_tpu.utils.profiling import (
                        format_memory_report,
                        memory_report as _memory_report,
                    )

                    logger.info(
                        "Train-step memory analysis: %s",
                        format_memory_report(_memory_report(
                            train_step, state, superbatch, step_rng
                        )),
                    )
                    memory_report = False
                state, metrics = train_step(state, superbatch, step_rng)
                global_step += 1
                if prof and prof["active"] and global_step >= prof["until"]:
                    # drain the async dispatch queue INSIDE the trace —
                    # block_until_ready does not actually wait on the
                    # tunneled TPU (CLAUDE.md), a readback does.
                    np.asarray(metrics["total_loss"])
                    jax.profiler.stop_trace()
                    prof["active"] = False
                    logger.info("Profiler trace written to %s", prof["dir"])
                if pos is not None:
                    last_pos = (int(pos[0]), int(pos[1]))
                    if last_pos[0] >= max_epochs and not stopped:
                        # With a looping train loader the outer epoch
                        # loop never advances — enforce the documented
                        # max_epochs cap from the stream's own epoch
                        # counter instead (review finding: num_steps=None
                        # otherwise trained forever). Stop is deferred to
                        # the loop head so this step's metrics still log.
                        logger.warning(
                            "max_epochs=%d reached at step %d — stopping.",
                            max_epochs, global_step,
                        )
                        stopped = True
                pending_steps.append(global_step)
                pending_metrics.append(metrics)
                pending_images += (
                    superbatch["image"].shape[0] * superbatch["image"].shape[1]
                )
                if (
                    len(pending_steps) >= log_interval_steps
                    or global_step % preview_interval_steps == 0
                    or global_step % eval_interval_steps == 0
                ):
                    _flush_metrics()

                # Validation preview (reference train.py:147-189).
                if (
                    val_loader is not None
                    and global_step % preview_interval_steps == 0
                ):
                    try:
                        preview = next(val_preview_iter)
                    except StopIteration:
                        val_preview_iter = iter(val_loader)
                        try:
                            preview = next(val_preview_iter)
                        except StopIteration:
                            # empty val loader must fail loudly (round-1
                            # finding), not escape as a bare StopIteration
                            raise RuntimeError(
                                "Validation loader yielded no batches — "
                                "check --val-chunks / --chunks-dir."
                            ) from None
                    db = {
                        k: preview[k]
                        for k in ("image", "depth", "keypoints_2d",
                                  "joints_3d", "depth_scale")
                        if k in preview
                    }
                    # Pad a ragged final val batch to the loader's batch
                    # size (same recipe as evaluate()): an off-size batch
                    # fails the mesh's in_shardings outright and forces a
                    # fresh ~40 s compile on a single device.
                    bs = db["image"].shape[0]
                    pad_to = getattr(val_loader, "batch_size", bs)
                    if bs < pad_to:
                        db = {
                            k: np.concatenate(
                                [v, np.repeat(v[:1], pad_to - bs, axis=0)]
                            )
                            for k, v in db.items()
                        }
                    _, preds = eval_step(
                        eval_view(state), _global_val_batch(db, mesh)
                    )
                    preds = np.asarray(jax.device_get(preds))
                    try:
                        import matplotlib.pyplot as plt

                        from pose3d_tpu.viz import fig_to_image, visualize_comparison

                        fig = visualize_comparison(
                            preview["image"][0],
                            preds[0],
                            preview["joints_3d"][0],
                            title=f"Val Preview Step {global_step}",
                        )
                        writer.add_image(
                            "Val_Preview/comparison",
                            np.asarray(fig_to_image(fig)),
                            global_step,
                        )
                        plt.close(fig)
                    except Exception:
                        logger.exception("Preview visualization failed")

                # Full validation + checkpoint (reference train.py:192-309).
                if global_step % eval_interval_steps == 0:
                    val_mpjpe = None
                    if val_loader is not None:
                        logger.info(
                            "Full validation at step %d ...", global_step
                        )
                        val = evaluate(
                            eval_step, eval_view(state), val_loader,
                            pad_to=getattr(val_loader, "batch_size", None),
                            mesh=mesh,
                        )
                        # evaluate() raises on an empty loader, so val is
                        # always populated here
                        writer.add_scalar(
                            "Loss/validation_epoch_avg",
                            val["total_loss"], global_step,
                        )
                        writer.add_scalar(
                            "Metrics/MPJPE_validation_epoch_avg",
                            val["mpjpe"], global_step,
                        )
                        writer.add_scalar(
                            "Metrics/PA_MPJPE_validation_epoch_avg",
                            val["pa_mpjpe"], global_step,
                        )
                        for k, v in val.items():
                            if k not in ("mpjpe", "pa_mpjpe"):
                                writer.add_scalar(
                                    f"Loss_Components_Val/{k}", v, global_step
                                )
                        logger.info(
                            "Step %d: Val Loss: %.4f, MPJPE: %.2f mm, "
                            "PA-MPJPE: %.2f mm",
                            global_step, val["total_loss"],
                            val["mpjpe"], val["pa_mpjpe"],
                        )
                        val_mpjpe = val["mpjpe"]
                    if saves_ckpt:
                        from pose3d_tpu.train.checkpoint import (
                            checkpoint_path,
                        )

                        ckpt_path = save_checkpoint(
                            checkpoint_path(
                                checkpoint_prefix, model_type, global_step
                            ),
                            state, model_type, model_args,
                            extra_meta=_ckpt_meta(),
                        )
                        if val_mpjpe is not None and is_primary:
                            from pose3d_tpu.train.checkpoint import record_best

                            record_best(
                                checkpoint_prefix, model_type,
                                global_step, val_mpjpe, ckpt_path,
                            )
                        if keep_checkpoints is not None and is_primary:
                            from pose3d_tpu.train.checkpoint import (
                                apply_retention,
                            )

                            apply_retention(
                                checkpoint_prefix, model_type,
                                keep_checkpoints,
                            )
                    last_ckpt_step = global_step
                    # preview/eval/checkpoint time must not pollute the
                    # next Perf/* window (it would inflate step_time_ms
                    # ~100x at eval steps)
                    window_t0 = time.perf_counter()
                elif global_step % preview_interval_steps == 0:
                    window_t0 = time.perf_counter()
    except KeyboardInterrupt:
        logger.warning(
            "Interrupted at step %d — saving final checkpoint.", global_step
        )
    finally:
        # Any exit path — clean, interrupt, or crash (remote-TPU timeout,
        # decode error, eval raise) — must flush metrics and preserve
        # progress since the last periodic save (round-1 finding; a crash
        # AT the eval step would otherwise lose eval_interval-1 steps).
        if prof and prof["active"]:
            # training ended inside the trace window — close it so the
            # partial trace is still viewable
            try:
                jax.profiler.stop_trace()
                logger.info(
                    "Profiler trace (partial) written to %s", prof["dir"]
                )
            except Exception:
                logger.exception("Failed to stop profiler trace")
        _flush_metrics()
        if global_step > last_ckpt_step and saves_ckpt:
            from pose3d_tpu.train.checkpoint import checkpoint_path

            save_checkpoint(
                checkpoint_path(checkpoint_prefix, model_type, global_step),
                state, model_type, model_args, extra_meta=_ckpt_meta(),
            )
            if keep_checkpoints is not None and is_primary:
                from pose3d_tpu.train.checkpoint import apply_retention

                apply_retention(
                    checkpoint_prefix, model_type, keep_checkpoints
                )
        writer.flush()
    return state, global_step
