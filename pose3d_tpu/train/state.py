"""Training state: params + BatchNorm running stats + optimizer state + step,
as one pytree that pjit shards/replicates as a unit."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    # Static (non-pytree) fields.
    apply_fn: Any = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    # Exponential moving average of params (opt-in production extra; the
    # reference has no weight averaging). None = disabled — None is an
    # empty pytree so jit/sharding treat the state identically.
    ema_params: Any = None
    # EMA mirror of the BatchNorm running statistics, averaged with the
    # same ramped decay as ema_params (timm ModelEma semantics: the FULL
    # model state is averaged, buffers included). Averaged weights paired
    # with the LIVE model's running stats are an era mismatch that breaks
    # a BatchNorm network outright — measured 2909 mm EMA vs 491 mm raw
    # held-out MPJPE on a 600-step CNN run (docs/ROUND5.md; the LayerNorm
    # ViT, which normalizes per-sample, improved under the same protocol).
    # None when EMA is off, or on legacy checkpoints recorded before this
    # field existed (with_ema_params then falls back to live stats).
    ema_batch_stats: Any = None


def make_lr_schedule(
    learning_rate: float,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: Optional[int] = None,
    end_lr_factor: float = 0.0,
):
    """Learning-rate schedule factory. The reference trains at a fixed LR
    (src/config.py:20, no scheduler anywhere in src/train.py) — that stays
    the default; cosine/linear decay with linear warmup are opt-in
    production extras. Returns a float for "constant" without warmup (so
    the default optimizer state is unchanged), else an optax schedule."""
    schedule = (schedule or "constant").lower()
    if schedule == "constant" and not warmup_steps:
        return learning_rate
    if schedule != "constant" and not decay_steps:
        raise ValueError(
            f"lr schedule '{schedule}' needs decay_steps (the step budget "
            "over which to decay; pass --num-steps or --schedule-steps)"
        )
    if schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)],
            [warmup_steps],
        )
    end_value = learning_rate * end_lr_factor
    if schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, decay_steps,
            end_value=end_value,
        )
    if schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.linear_schedule(
                 learning_rate, end_value,
                 max(decay_steps - warmup_steps, 1))],
            [warmup_steps],
        )
    raise ValueError(f"Unknown lr schedule: {schedule!r} "
                     "(expected constant|cosine|linear)")


def make_optimizer(
    learning_rate=1e-3,
    weight_decay: float = 0.01,
    params=None,
    frozen_prefixes: Sequence[str] = (),
    trainable_exceptions: Sequence[str] = (),
    clip_grad_norm: Optional[float] = None,
):
    """AdamW with the reference's hyperparameters (src/config.py:20-22,
    main.py:130-132).

    ``learning_rate`` may be a float or an optax schedule
    (make_lr_schedule). ``clip_grad_norm`` prepends global-norm gradient
    clipping — opt-in; the reference never clips.

    ``frozen_prefixes`` freezes parameter subtrees by path prefix
    ("a/b/..."), with ``trainable_exceptions`` re-enabling nested subtrees
    — the reference's ``vit_freeze_backbone`` keeps the adapted
    patch-embed trainable inside the frozen backbone
    (src/models/transformers.py:226-236):
    ``frozen_prefixes=["vit_backbone"],
    trainable_exceptions=["vit_backbone/patch_embed"]``.
    """
    base = optax.adamw(learning_rate, weight_decay=weight_decay)
    if clip_grad_norm is not None:
        base = optax.chain(
            optax.clip_by_global_norm(float(clip_grad_norm)), base
        )
    if not frozen_prefixes:
        return base
    if params is None:
        raise ValueError("params required to build the freeze mask")

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path) -> str:
        keys = "/".join(
            getattr(p, "key", getattr(p, "idx", "?")) for p in path
        )
        if any(keys.startswith(e) for e in trainable_exceptions):
            return "train"
        if any(keys.startswith(f) for f in frozen_prefixes):
            return "frozen"
        return "train"

    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [label_of(path) for path, _ in flat],
    )
    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(
    model,
    variables: Dict,
    learning_rate=1e-3,
    weight_decay: float = 0.01,
    tx: Optional[optax.GradientTransformation] = None,
    frozen_prefixes: Sequence[str] = (),
    trainable_exceptions: Sequence[str] = (),
    clip_grad_norm: Optional[float] = None,
    ema: bool = False,
) -> TrainState:
    if tx is None:
        tx = make_optimizer(
            learning_rate, weight_decay,
            params=variables.get("params"),
            frozen_prefixes=frozen_prefixes,
            trainable_exceptions=trainable_exceptions,
            clip_grad_norm=clip_grad_norm,
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
        # EMA starts at the initial params/stats. COPIED buffers, not
        # aliases — the train step donates the state, and donating the
        # same buffer through both params and ema_params is an XLA error.
        ema_params=(
            jax.tree_util.tree_map(jax.numpy.copy, params) if ema else None
        ),
        ema_batch_stats=(
            jax.tree_util.tree_map(jax.numpy.copy, batch_stats)
            if ema else None
        ),
    )


def with_ema_params(state: TrainState) -> TrainState:
    """State whose live params (and BatchNorm running stats, when the
    averaged mirror exists) are the EMA view — feed to eval/export.
    No-op when EMA is disabled. Legacy checkpoints recorded before
    ema_batch_stats existed fall back to the live running stats."""
    if state.ema_params is None:
        return state
    kw = {}
    if state.ema_batch_stats is not None:
        kw["batch_stats"] = state.ema_batch_stats
    return state.replace(params=state.ema_params, **kw)
