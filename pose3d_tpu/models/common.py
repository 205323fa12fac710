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
    (reference src/models/common.py:55-89).

    ``init``: "kaiming" inside the CNN (reference cnn.py:636-639 applies
    kaiming fan_out model-wide), "xavier" inside the transformer
    (reference transformers.py:317-321)."""

    num_joints: int
    hidden_dims: Sequence[int] = (512, 256)
    dropout: float = 0.2
    activation: str = "gelu"
    init: str = "kaiming"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kernel_init = (
            nn.initializers.variance_scaling(2.0, "fan_out", "normal")
            if self.init == "kaiming"
            else nn.initializers.xavier_uniform()
        )
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        act = get_activation(self.activation)
        for h in self.hidden_dims:
            x = nn.Dense(h, kernel_init=kernel_init, dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
            x = act(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(
            self.num_joints * 3, kernel_init=kernel_init,
            dtype=jnp.float32, param_dtype=self.param_dtype,
        )(x)
        return x.reshape(-1, self.num_joints, 3).astype(jnp.float32)
