"""Model construction/initialization from self-describing configs, mirroring
the reference's checkpoint-driven model rebuild (main.py:112-144,
infer.py:80-99): a model_type + model_args dict fully determines the
architecture."""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pose3d_tpu.core.config import (
    CNNModelConfig,
    TransformerModelConfig,
    make_model_config,
)
from pose3d_tpu.models.cnn import CNNPoseEstimation
from pose3d_tpu.models.transformer import TransformerPoseEstimation


def build_model(config, *, attention_backend: str = "pallas",
                dtype=jnp.bfloat16, param_dtype=jnp.float32,
                **model_kwargs):
    """Instantiate the Flax module for a model config (or model_type str).

    Extra ``model_kwargs`` are forwarded to the module constructor
    (transformer only — e.g. ``vit_stacked``/``vit_block_runner`` for the
    pipeline-parallel layout, ``remat``)."""
    if isinstance(config, str):
        config = make_model_config(config)
    if isinstance(config, CNNModelConfig):
        if set(model_kwargs) - {"remat"}:
            raise ValueError(
                f"unsupported CNN model kwargs: {sorted(model_kwargs)}"
            )
        return CNNPoseEstimation(config, dtype=dtype, param_dtype=param_dtype,
                                 **model_kwargs)
    if isinstance(config, TransformerModelConfig):
        return TransformerPoseEstimation(
            config, attention_backend=attention_backend,
            dtype=dtype, param_dtype=param_dtype, **model_kwargs,
        )
    raise ValueError(f"Unsupported model config: {type(config)}")


def dummy_inputs(config, batch_size: int = 1):
    """Zero-filled inputs with the model's static shapes (NHWC)."""
    H, W = config.image_size
    J = config.num_joints
    return (
        jnp.zeros((batch_size, H, W, 3), jnp.float32),
        jnp.zeros((batch_size, H, W, 1), jnp.float32),
        jnp.full((batch_size, J, 2), 0.5, jnp.float32),
    )


def init_model(config, rng: Optional[jax.Array] = None, batch_size: int = 1,
               **kwargs) -> Tuple[Any, Dict]:
    """Build and initialize a model; returns (module, variables)."""
    if isinstance(config, str):
        config = make_model_config(config)
    model = build_model(config, **kwargs)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # jit the init: one XLA compilation instead of one per eager op (matters
    # a lot on slow hosts; also produces the exact same params).
    init_fn = jax.jit(partial(model.init, train=False))
    variables = init_fn(rng, *dummy_inputs(config, batch_size))
    return model, variables
