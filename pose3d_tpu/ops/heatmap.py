"""Gaussian heatmap rendering from 2D keypoints.

Spec: reference src/models/common.py:6-51 — for each joint j with normalized
keypoint (x, y), render exp(-((X-μx)² + (Y-μy)²) / 2σ²) on an S×S grid with
μ = keypoint·(S-1), then zero the whole map when any coordinate of the
keypoint is <= 0 (validity mask).

TPU-first design: the isotropic Gaussian is separable —
exp(-(dx²+dy²)/2σ²) = exp(-dx²/2σ²) · exp(-dy²/2σ²) — so instead of
materializing a [B, J, S, S] distance field like the reference, we compute two
thin factors gy [B, J, S] and gx [B, J, S] and combine them with one einsum
(an outer product per joint, which XLA maps onto the MXU). For the CNN's
S=500, J=17 this turns ~O(B·J·S²) transcendentals into O(B·J·S), and the big
[B, S, S, J] tensor is produced directly in NHWC layout ready to be
concatenated with the image channels.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_heatmaps(keypoints_2d, heatmap_size: int, sigma: float,
                      dtype=jnp.float32):
    """Render per-joint Gaussian heatmaps.

    Args:
      keypoints_2d: [B, J, 2] normalized (x, y) in [0, 1].
      heatmap_size: output spatial size S.
      sigma: Gaussian std-dev in heatmap pixels.
      dtype: output dtype (bfloat16 in the compute path).

    Returns:
      [B, S, S, J] heatmaps (NHWC; channel-last, unlike the reference's NCHW).
    """
    kpts = jnp.asarray(keypoints_2d, jnp.float32)
    S = heatmap_size
    mu = kpts * (S - 1)                              # [B, J, 2]
    coords = jnp.arange(S, dtype=jnp.float32)        # [S]
    inv = 1.0 / (2.0 * sigma * sigma)

    dx = coords[None, None, :] - mu[..., 0:1]        # [B, J, S]
    dy = coords[None, None, :] - mu[..., 1:2]        # [B, J, S]
    gx = jnp.exp(-(dx * dx) * inv)                   # [B, J, S]
    gy = jnp.exp(-(dy * dy) * inv)                   # [B, J, S]

    # Validity mask: zero out joints with any coordinate <= 0
    # (reference src/models/common.py:48-49).
    valid = jnp.all(kpts > 0, axis=-1)               # [B, J]
    gx = gx * valid[..., None]

    # Outer product per (batch, joint): [B,J,H]×[B,J,W] -> [B,H,W,J].
    hm = jnp.einsum("bjh,bjw->bhwj", gy, gx)
    return hm.astype(dtype)


def gaussian_heatmaps_nchw(keypoints_2d, heatmap_size: int, sigma: float,
                           dtype=jnp.float32):
    """NCHW variant ([B, J, S, S]) for API parity with the reference."""
    return jnp.transpose(
        gaussian_heatmaps(keypoints_2d, heatmap_size, sigma, dtype), (0, 3, 1, 2)
    )
