"""Pose-estimation metrics: MPJPE and PA-MPJPE.

PA-MPJPE design notes (reference src/utils.py:72-165): the reference loops
over the batch in Python doing one SVD per sample. Here the whole batch runs
as one vmapped, branchless computation (sign flips via ``jnp.where``) which
XLA compiles to a single fused program — no Python loop, no host sync.

Conventions kept exactly from the reference:
  * covariance M = Pcᵀ Gc with SVD M = U diag(S) Vᵀ;
  * reflection fix via flipping the smallest singular vector when the
    candidate rotation has negative determinant, negating the last singular
    value in the scale sum (src/utils.py:121-141);
  * scale s = trace(Σ·D) / trace(Pcᵀ Pc) with s = 1 fallback for degenerate
    predictions (src/utils.py:143-154);
  * alignment s · Pc · R + μ_gt (src/utils.py:156-159).

One deliberate deviation (SURVEY.md §7 "quirks to handle deliberately, not
copy blindly"): the reference right-multiplies by R = V Uᵀ, which is the
*transpose* of the Procrustes optimum for row-vector points — the optimal
right-multiplier maximizing trace(Rᵀ M) is R = U Vᵀ. The transposed rotation
makes the metric non-invariant under rotations of the prediction and is why
the reference reports PA-MPJPE > MPJPE (impossible under true alignment).
This module defaults to the correct rotation; pass
``compat_transposed_rotation=True`` to reproduce the reference's numbers
bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def mpjpe(pred, gt):
    """Mean Per Joint Position Error.

    Args:
      pred, gt: [..., J, 3].
    Returns:
      scalar: mean over all leading axes and joints of the per-joint L2 error
      (reference src/utils.py:55-69).
    """
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if pred.shape != gt.shape:
        raise ValueError(f"Shape mismatch: pred {pred.shape}, gt {gt.shape}")
    err = jnp.linalg.norm(pred - gt, axis=-1)
    return err.mean()


def _procrustes_single(pred, gt, transposed_rotation: bool):
    """Similarity-align ``pred`` to ``gt`` (one sample, [J, 3]).

    All matmuls run at HIGHEST precision: on TPU the default is bf16, which
    would inject ~0.4% error into a *metric* — poses span hundreds of mm, so
    that is ~0.5 mm of phantom PA-MPJPE. The matrices are tiny (3×3 / J×3);
    fp32 here is free.
    """
    hi = jax.lax.Precision.HIGHEST
    mu_p = pred.mean(axis=0, keepdims=True)
    mu_g = gt.mean(axis=0, keepdims=True)
    pc = pred - mu_p
    gc = gt - mu_g

    M = jnp.matmul(pc.T, gc, precision=hi)
    U, S, Vt = jnp.linalg.svd(M, full_matrices=False)

    # det(V Uᵀ) == det(U Vᵀ); flip smallest singular vector if negative.
    sign = jnp.where(jnp.linalg.det(U) * jnp.linalg.det(Vt) < 0, -1.0, 1.0)
    flip = jnp.ones(3).at[-1].set(sign)
    S_eff = S * flip

    if transposed_rotation:
        # Reference convention (src/utils.py:119-134): R = V_corrected Uᵀ.
        R = jnp.matmul((Vt * flip[:, None]).T, U.T, precision=hi)
    else:
        # Procrustes optimum for row vectors: R = U Z Vᵀ.
        R = jnp.matmul(U * flip[None, :], Vt, precision=hi)

    var_p = jnp.sum(pc * pc)
    s = jnp.where(var_p > 1e-9, jnp.sum(S_eff) / var_p, 1.0)

    return s * jnp.matmul(pc, R, precision=hi) + mu_g


def procrustes_align(pred, gt, compat_transposed_rotation: bool = False):
    """Batched similarity alignment of ``pred`` onto ``gt`` ([B, J, 3])."""
    fn = partial(_procrustes_single, transposed_rotation=compat_transposed_rotation)
    return jax.vmap(fn)(pred, gt)


def pa_mpjpe(pred, gt, compat_transposed_rotation: bool = False):
    """Procrustes-Aligned MPJPE, batched.

    Args:
      pred, gt: [B, J, 3].
      compat_transposed_rotation: reproduce the reference's transposed-rotation
        convention (see module docstring) instead of true alignment.
    Returns:
      scalar: mean over the batch of per-sample mean joint error after
      similarity alignment (reference src/utils.py:72-165).
    """
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if pred.shape != gt.shape:
        raise ValueError(f"Shape mismatch: pred {pred.shape}, gt {gt.shape}")
    aligned = procrustes_align(pred, gt, compat_transposed_rotation)
    err = jnp.linalg.norm(aligned - gt, axis=-1).mean(axis=-1)
    return err.mean()
