"""Shared model components.

The Gaussian heatmap generator lives in ``pose3d_tpu.ops.heatmap`` (it is a
pure function, not a module). Here: the pose regression head shared by both
lifting models (reference src/models/common.py:55-89 and the flat variant in
src/models/transformers.py:7-31 — numerically the same MLP).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pose3d_tpu.ops.activations import get_activation


class PoseRegressionHead(nn.Module):
    """MLP regression head: per hidden dim Linear→act→Dropout, then a final
    Linear to num_joints·3 reshaped to [B, J, 3]
    (reference src/models/common.py:55-89)."""

    num_joints: int
    hidden_dims: Sequence[int] = (512, 256)
    dropout: float = 0.2
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        act = get_activation(self.activation)
        for h in self.hidden_dims:
            x = nn.Dense(h, dtype=self.dtype, param_dtype=self.param_dtype)(x)
            x = act(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(
            self.num_joints * 3, dtype=jnp.float32, param_dtype=self.param_dtype
        )(x)
        return x.reshape(-1, self.num_joints, 3).astype(jnp.float32)
