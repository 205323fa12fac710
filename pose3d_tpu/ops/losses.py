"""Composite pose loss.

total = w_mse·MSE + w_l1·L1 + w_ij·inter-joint + w_root·abs-root
(reference src/loss.py:11-85), returned together with a components dict for
logging parity with the reference trainer (src/train.py:129-139).

The inter-joint term compares all J·(J-1)/2 unique pairwise joint distances.
Rather than gathering upper-triangle indices (reference src/loss.py:42-44),
we compute the full [B, J, J] distance matrices and take a masked mean — the
matrix is symmetric with a zero diagonal, so the strict-upper-triangle mean
equals the masked full-matrix mean; everything stays dense and fusable.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp


class LossWeights(NamedTuple):
    """Loss weights (reference src/config.py:14-18 defaults)."""

    mse: float = 1.0
    l1: float = 1.0
    inter_joint: float = 100.0
    abs_root: float = 1.0


def _pairwise_distances(joints):
    """[B, J, 3] -> [B, J, J] Euclidean distance matrix."""
    diff = joints[:, :, None, :] - joints[:, None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)


def inter_joint_distance_per_sample(pred, gt):
    """Per-sample mean |pairwise-dist(pred) − pairwise-dist(gt)| over unique
    joint pairs: [B]."""
    J = pred.shape[-2]
    pd = _pairwise_distances(pred)
    gd = _pairwise_distances(gt)
    err = jnp.abs(pd - gd)
    mask = jnp.triu(jnp.ones((J, J), dtype=err.dtype), k=1)
    return jnp.sum(err * mask, axis=(1, 2)) / mask.sum()


def inter_joint_distance_loss(pred, gt):
    """Mean |pairwise-dist(pred) − pairwise-dist(gt)| over unique joint pairs
    (reference src/loss.py:29-47)."""
    return inter_joint_distance_per_sample(pred, gt).mean()


def abs_root_distance_loss(pred, gt, root_index: int = 0):
    """Mean absolute root-joint offset (reference src/loss.py:49-55)."""
    return jnp.abs(pred[:, root_index, :] - gt[:, root_index, :]).mean()


def composite_pose_loss(
    pred,
    gt,
    weights: LossWeights = LossWeights(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted total loss plus a components dict (reference src/loss.py:57-85).

    Args:
      pred, gt: [B, J, 3] predicted / ground-truth 3D joints.
    Returns:
      (total_loss, {"mse_loss", "l1_loss", "inter_joint_loss",
                    "abs_root_loss", "total_loss"}).
    """
    total, components = composite_pose_loss_per_sample(pred, gt, weights)
    return total.mean(), {k: v.mean() for k, v in components.items()}


def composite_pose_loss_per_sample(
    pred,
    gt,
    weights: LossWeights = LossWeights(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-sample variant: every component is a [B] vector (used for exact
    masked validation over ragged final batches). Batch means of these
    equal the scalar loss exactly — every term is a per-sample mean."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)

    diff = pred - gt
    mse_loss = jnp.mean(diff * diff, axis=(1, 2))
    l1_loss = jnp.mean(jnp.abs(diff), axis=(1, 2))
    ij_loss = inter_joint_distance_per_sample(pred, gt)
    root_loss = jnp.abs(pred[:, 0, :] - gt[:, 0, :]).mean(axis=1)

    total = (
        weights.mse * mse_loss
        + weights.l1 * l1_loss
        + weights.inter_joint * ij_loss
        + weights.abs_root * root_loss
    )
    components = {
        "mse_loss": mse_loss,
        "l1_loss": l1_loss,
        "inter_joint_loss": ij_loss,
        "abs_root_loss": root_loss,
        "total_loss": total,
    }
    return total, components
