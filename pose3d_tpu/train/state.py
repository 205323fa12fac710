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


def make_optimizer(
    learning_rate: float = 1e-3,
    weight_decay: float = 0.01,
    params=None,
    frozen_prefixes: Sequence[str] = (),
    trainable_exceptions: Sequence[str] = (),
):
    """AdamW with the reference's hyperparameters (src/config.py:20-22,
    main.py:130-132).

    ``frozen_prefixes`` freezes parameter subtrees by path prefix
    ("a/b/..."), with ``trainable_exceptions`` re-enabling nested subtrees
    — the reference's ``vit_freeze_backbone`` keeps the adapted
    patch-embed trainable inside the frozen backbone
    (src/models/transformers.py:226-236):
    ``frozen_prefixes=["vit_backbone"],
    trainable_exceptions=["vit_backbone/patch_embed"]``.
    """
    base = optax.adamw(learning_rate, weight_decay=weight_decay)
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
    learning_rate: float = 1e-3,
    weight_decay: float = 0.01,
    tx: Optional[optax.GradientTransformation] = None,
    frozen_prefixes: Sequence[str] = (),
    trainable_exceptions: Sequence[str] = (),
) -> TrainState:
    if tx is None:
        tx = make_optimizer(
            learning_rate, weight_decay,
            params=variables.get("params"),
            frozen_prefixes=frozen_prefixes,
            trainable_exceptions=trainable_exceptions,
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
    )
