"""Training state: params + BatchNorm running stats + optimizer state + step,
as one pytree that pjit shards/replicates as a unit."""

from __future__ import annotations

from typing import Any, Dict, Optional

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


def make_optimizer(learning_rate: float = 1e-3, weight_decay: float = 0.01):
    """AdamW with the reference's hyperparameters (src/config.py:20-22,
    main.py:130-132)."""
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def create_train_state(
    model,
    variables: Dict,
    learning_rate: float = 1e-3,
    weight_decay: float = 0.01,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    if tx is None:
        tx = make_optimizer(learning_rate, weight_decay)
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
