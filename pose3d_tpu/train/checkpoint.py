"""Self-describing checkpoints.

Contract parity with the reference (src/train.py:300-309, main.py:112-160,
infer.py:73-131): a checkpoint carries {step, model params/stats, optimizer
state, model_args, model_type} and is sufficient to reconstruct the model
architecture without external config.

Format: an orbax PyTree checkpoint directory named
``{prefix}_{model_type}_step_{N}`` (same naming scheme as the reference's
.pth files) containing the state arrays, plus ``meta.json`` with
{step, model_type, model_args}.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Tuple

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger("pose3d_tpu.train")


def checkpoint_path(prefix: str, model_type: str, step: int) -> Path:
    return Path(f"{prefix}_{model_type}_step_{step}")


def _all_fully_replicated(tree) -> bool:
    """True when every jax.Array leaf is fully replicated (any host can
    read the whole state locally). False for FSDP/TP-sharded states, where
    checkpointing must be collective across processes."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
            return False
    return True


def _state_tree(state) -> Dict:
    """The exact pytree save_checkpoint serializes — single source of
    truth, shared with state_needs_collective_checkpoint so the
    process-0-gate predicate and the save branch can never disagree
    (a field added to one but not the other would deadlock the orbax
    barrier on a pod)."""
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if getattr(state, "ema_params", None) is not None:
        tree["ema_params"] = state.ema_params
    if getattr(state, "ema_batch_stats", None) is not None:
        tree["ema_batch_stats"] = state.ema_batch_stats
    return tree


def state_needs_collective_checkpoint(state) -> bool:
    """Whether saving ``state`` requires EVERY process to call
    save_checkpoint (sharded FSDP/TP state on a multi-process runtime) —
    the train loop uses this to widen its process-0 checkpoint gate."""
    if jax.process_count() == 1:
        return False
    return not _all_fully_replicated(_state_tree(state))


def save_checkpoint(path, state, model_type: str, model_args: Dict,
                    extra_meta: Dict = None) -> Path:
    """Save state + architecture metadata. ``state`` is a TrainState or any
    pytree with params/batch_stats/opt_state/step. ``extra_meta`` entries
    (e.g. ``data_state`` for deterministic mid-epoch resume) are merged
    into meta.json."""
    from pose3d_tpu.core.transfer import bulk_device_get

    path = Path(path).absolute()
    tree = _state_tree(state)
    if jax.process_count() > 1 and not _all_fully_replicated(tree):
        # Sharded state (FSDP/ZeRO-3 on a pod): no single host holds the
        # full arrays, so checkpointing is COLLECTIVE — every process
        # calls save_checkpoint (the train loop arranges this) and the
        # jax.Array leaves go straight to orbax, whose array handler has
        # each host write exactly its addressable shards (requires a
        # filesystem shared across hosts, the standard orbax contract).
        ckptr_cm = ocp.PyTreeCheckpointer()
    elif jax.process_count() > 1:
        # Replicated state: save_checkpoint is called on the PRIMARY
        # process only (train loop gates on process_index()==0), so
        #  * no jitted bulk pack — that would launch a global-mesh
        #    computation from one process and deadlock the others; the
        #    replicated state reads straight off the local replica, and
        #  * orbax's save barrier must span only {0} — PyTreeCheckpointer's
        #    default sync_global_processes waits on every process and
        #    deadlocks against gated-out hosts (found by the real
        #    2-process test, tests/test_distributed_2proc.py).
        tree = jax.device_get(tree)
        mpo = ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0}
        )
        ckptr_cm = ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(multiprocessing_options=mpo),
            multiprocessing_options=mpo,
        )
    else:
        # One bulk device→host transfer; letting orbax fetch per-array
        # costs ~1 s/array through a remote-TPU tunnel (225 arrays ≈ 4 min).
        tree = bulk_device_get(tree)
        ckptr_cm = ocp.PyTreeCheckpointer()
    with ckptr_cm as ckptr:
        ckptr.save(path / "state", tree, force=True)
    if jax.process_index() == 0:
        meta = {
            # already on host from the bulk fetch — a separate device_get
            # costs ~1 s per array through the remote-TPU tunnel (step is
            # replicated even in sharded states, so int() is local)
            "step": int(jax.device_get(tree["step"])),
            "model_type": model_type,
            "model_args": model_args,
            "format": "pose3d_tpu/v1",
            **(extra_meta or {}),
        }
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f, indent=2)
    logger.info("Saved checkpoint to %s", path)
    return path


def _sibling_checkpoints(prefix: str, model_type: str):
    """All checkpoint dirs written under ``{prefix}_{model_type}_step_*``,
    as (step, path) sorted by step. Only directories that carry our own
    meta.json are considered — retention must never touch anything this
    framework didn't write."""
    import re

    base = Path(f"{prefix}_{model_type}_step_0").absolute().parent
    name = Path(f"{prefix}_{model_type}_step_").name
    out = []
    pat = re.compile(re.escape(name) + r"(\d+)$")
    if not base.exists():
        return out
    for p in base.iterdir():
        m = pat.fullmatch(p.name)
        if m and p.is_dir() and (p / "meta.json").exists():
            out.append((int(m.group(1)), p))
    return sorted(out)


def latest_checkpoint(prefix: str, model_type: str):
    """Newest (highest-step) checkpoint dir for this prefix/model_type, or
    None. Powers ``--checkpoint auto``: a preempted job restarted with the
    SAME command line picks up from its last save (pairs with the SIGTERM
    checkpoint-and-exit path; the reference requires naming the .pth by
    hand on every resume)."""
    ckpts = _sibling_checkpoints(prefix, model_type)
    return ckpts[-1][1] if ckpts else None


def best_checkpoint_path(prefix: str, model_type: str) -> Path:
    return Path(f"{prefix}_{model_type}_best.json").absolute()


def record_best(prefix: str, model_type: str, step: int, mpjpe: float,
                ckpt_path) -> bool:
    """Track the best-by-validation-MPJPE checkpoint in a sidecar JSON
    (the reference keeps no best-model pointer, SURVEY.md §5). Returns True
    when ``mpjpe`` improves on the recorded best."""
    bp = best_checkpoint_path(prefix, model_type)
    best = None
    if bp.exists():
        try:
            with open(bp) as f:
                best = json.load(f)
        except Exception:
            logger.warning("Unreadable best-checkpoint record %s", bp)
    if best is not None and float(best.get("mpjpe", float("inf"))) <= mpjpe:
        return False
    with open(bp, "w") as f:
        json.dump(
            {"step": int(step), "mpjpe": float(mpjpe),
             "path": str(Path(ckpt_path).absolute())},
            f, indent=2,
        )
    logger.info("New best checkpoint at step %d (MPJPE %.2f mm)", step, mpjpe)
    return True


def apply_retention(prefix: str, model_type: str, keep_last: int) -> None:
    """Delete all but the newest ``keep_last`` checkpoints for this
    prefix/model_type, always protecting the recorded best checkpoint.
    Opt-in (the reference keeps every checkpoint; so does this framework
    unless --keep-checkpoints is given)."""
    import shutil

    if keep_last is None or keep_last < 1:
        return
    ckpts = _sibling_checkpoints(prefix, model_type)
    protect = set()
    bp = best_checkpoint_path(prefix, model_type)
    if bp.exists():
        try:
            with open(bp) as f:
                protect.add(Path(json.load(f)["path"]).absolute())
        except Exception:
            pass
    for _step, p in ckpts[:-keep_last]:
        if p.absolute() in protect:
            continue
        logger.info("Retention: removing old checkpoint %s", p)
        shutil.rmtree(p, ignore_errors=True)


def _checkpoint_top_keys(path):
    """Top-level keys of the saved state tree, from the orbax metadata —
    no array reads. Empty on any failure."""
    try:
        with ocp.PyTreeCheckpointer() as ckptr:
            md = ckptr.metadata(Path(path).absolute() / "state")
        md_tree = getattr(getattr(md, "item_metadata", md), "tree", md)
        return set(md_tree)
    except Exception:
        return set()


def checkpoint_has_ema(path) -> bool:
    """Whether the checkpoint carries EMA weights (saved by training with
    ema enabled) — checked from the orbax metadata, no array reads."""
    return "ema_params" in _checkpoint_top_keys(path)


def load_checkpoint_meta(path) -> Dict:
    with open(Path(path) / "meta.json") as f:
        return json.load(f)


def load_checkpoint(path, template_state=None) -> Tuple[Dict, Dict]:
    """Load (tree, meta) with all arrays on the default device.

    Arrays are restored host-side as numpy and pushed to device in ONE
    batched ``jax.device_put``. Restoring straight to device instead leaves
    orbax/tensorstore lazy arrays that materialize one-by-one on first use —
    measured ~1 s/array × 225 arrays (~4 min) through a remote-TPU tunnel.

    If ``template_state`` is given its tree structure is used for
    validation; arrays still restore host-side first.
    """
    import numpy as np

    path = Path(path).absolute()
    meta = load_checkpoint_meta(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template_state is not None:
            template = {
                "step": template_state.step,
                "params": template_state.params,
                "batch_stats": template_state.batch_stats,
                "opt_state": template_state.opt_state,
            }
            if getattr(template_state, "ema_params", None) is not None:
                # include EMA weights only when the checkpoint carries them
                # (a pre-EMA checkpoint restores into an EMA-enabled state,
                # which keeps its freshly-initialized ema_params)
                keys = _checkpoint_top_keys(path)
                if "ema_params" in keys:
                    template["ema_params"] = template_state.ema_params
                if ("ema_batch_stats" in keys and
                        getattr(template_state, "ema_batch_stats", None)
                        is not None):
                    template["ema_batch_stats"] = (
                        template_state.ema_batch_stats
                    )
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
            )
            tree = ckptr.restore(
                path / "state", item=template, restore_args=restore_args
            )
        else:
            metadata = ckptr.metadata(path / "state")
            md_tree = getattr(
                getattr(metadata, "item_metadata", metadata), "tree", metadata
            )
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), md_tree
            )
            tree = ckptr.restore(path / "state", restore_args=restore_args)
    from pose3d_tpu.core.transfer import bulk_device_put

    tree = bulk_device_put(tree)  # one transfer per dtype, not per array
    return tree, meta


def _ema_restore_kw(tree, state):
    """replace() kwargs for the EMA slots of ``state`` from a restored
    ``tree``. Legacy EMA checkpoints (ema_params but no ema_batch_stats —
    recorded before the stats mirror existed) seed the stats mirror from
    the restored LIVE running stats: that reproduces the old eval
    behavior exactly and the mirror converges to the proper average as
    training continues."""
    kw = {}
    if "ema_params" in tree and getattr(state, "ema_params", None) is not None:
        kw["ema_params"] = tree["ema_params"]
        if getattr(state, "ema_batch_stats", None) is not None:
            kw["ema_batch_stats"] = (
                tree["ema_batch_stats"] if "ema_batch_stats" in tree
                else jax.tree_util.tree_map(
                    jax.numpy.copy, tree["batch_stats"]
                )
            )
    return kw


def restore_train_state(state, path):
    """Return a copy of ``state`` with arrays restored from ``path``.
    Optimizer-state/architecture mismatches fall back to params-only restore
    (the reference's strict→non-strict fallback, main.py:134-141)."""
    try:
        tree, meta = load_checkpoint(path, template_state=state)
        return (
            state.replace(
                step=tree["step"],
                params=tree["params"],
                batch_stats=tree["batch_stats"],
                opt_state=tree["opt_state"],
                **_ema_restore_kw(tree, state),
            ),
            meta,
        )
    except Exception:
        # Loud and with the traceback: this path is a FEATURE for
        # architecture/opt-state mismatches (reference main.py:134-141),
        # but it also catches transient failures — the user must be able
        # to see why the full restore failed, because the fallback resets
        # the AdamW moments and step count of the optimizer.
        logger.warning(
            "Full state restore failed for %s; retrying params-only. "
            "The OPTIMIZER STATE WILL BE RE-INITIALIZED (fresh AdamW "
            "moments). Cause:", path, exc_info=True,
        )
        tree, meta = load_checkpoint(path)
        kw = _ema_restore_kw(tree, state)
        return (
            state.replace(
                step=jax.numpy.asarray(tree["step"]),
                params=tree["params"],
                batch_stats=tree.get("batch_stats", state.batch_stats),
                **kw,
            ),
            meta,
        )
