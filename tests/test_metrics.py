"""MPJPE / PA-MPJPE parity tests.

PA-MPJPE is validated two ways:
  * default mode against an independent numpy Umeyama implementation
    (the mathematically correct similarity alignment), including
    rotation/scale/translation invariance and the reflection case;
  * compat mode bit-matches the reference's formulas (src/utils.py:72-165),
    which use a transposed rotation (see pose3d_tpu.geometry.metrics).
"""

import numpy as np
import pytest

from pose3d_tpu.geometry import mpjpe, pa_mpjpe, procrustes_align

rng = np.random.default_rng(1)


def _numpy_pa_mpjpe(pred, gt, transposed=False):
    """Reference formulas (transposed=True) or correct Procrustes, in numpy."""
    errs = []
    for p, g in zip(pred, gt):
        mu_p, mu_g = p.mean(0), g.mean(0)
        pc, gc = p - mu_p, g - mu_g
        M = pc.T @ gc
        U, S, Vt = np.linalg.svd(M)
        S_eff = S.copy()
        flip = np.ones(3)
        if np.linalg.det(Vt.T @ U.T) < 0:
            flip[-1] = -1
            S_eff[-1] *= -1
        if transposed:
            R = (Vt * flip[:, None]).T @ U.T
        else:
            R = (U * flip[None, :]) @ Vt
        var_p = (pc ** 2).sum()
        s = S_eff.sum() / var_p if var_p > 1e-9 else 1.0
        aligned = s * pc @ R + mu_g
        errs.append(np.linalg.norm(aligned - g, axis=1).mean())
    return float(np.mean(errs))


def test_mpjpe_simple():
    pred = np.zeros((2, 17, 3), np.float32)
    gt = np.zeros((2, 17, 3), np.float32)
    gt[..., 0] = 3.0
    gt[..., 1] = 4.0  # every joint off by 5
    assert np.isclose(float(mpjpe(pred, gt)), 5.0, rtol=1e-6)


def test_mpjpe_matches_numpy():
    pred = rng.normal(size=(6, 17, 3)).astype(np.float32) * 100
    gt = rng.normal(size=(6, 17, 3)).astype(np.float32) * 100
    expected = np.linalg.norm(pred - gt, axis=2).mean()
    assert np.isclose(float(mpjpe(pred, gt)), expected, rtol=1e-5)


def test_pa_mpjpe_invariant_to_similarity_transform():
    """Aligning a rotated+scaled+translated copy of gt must give ~zero error."""
    gt = rng.normal(size=(4, 17, 3)).astype(np.float64) * 100
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    pred = 2.3 * gt @ R.T + np.array([10.0, -20.0, 5.0])
    err = float(pa_mpjpe(pred.astype(np.float32), gt.astype(np.float32)))
    assert err < 1e-2  # mm-scale poses, fp32 SVD


def test_pa_mpjpe_leq_mpjpe_after_centering():
    """True Procrustes alignment can't do worse than plain centering."""
    pred = rng.normal(size=(8, 17, 3)).astype(np.float32) * 50
    gt = rng.normal(size=(8, 17, 3)).astype(np.float32) * 50
    pa = float(pa_mpjpe(pred, gt))
    centered = pred - pred.mean(1, keepdims=True) + gt.mean(1, keepdims=True)
    assert pa <= float(mpjpe(centered, gt)) + 1e-3


def test_pa_mpjpe_matches_numpy():
    pred = rng.normal(size=(8, 17, 3)).astype(np.float32) * 50
    gt = rng.normal(size=(8, 17, 3)).astype(np.float32) * 50
    expected = _numpy_pa_mpjpe(pred.astype(np.float64), gt.astype(np.float64))
    got = float(pa_mpjpe(pred, gt))
    assert np.isclose(got, expected, rtol=1e-3)


def test_pa_mpjpe_compat_matches_reference_formula():
    pred = rng.normal(size=(8, 17, 3)).astype(np.float32) * 50
    gt = rng.normal(size=(8, 17, 3)).astype(np.float32) * 50
    expected = _numpy_pa_mpjpe(
        pred.astype(np.float64), gt.astype(np.float64), transposed=True
    )
    got = float(pa_mpjpe(pred, gt, compat_transposed_rotation=True))
    assert np.isclose(got, expected, rtol=1e-3)


def test_pa_mpjpe_reflection_case():
    """Force det<0: prediction is a mirrored gt. The reflection fix must
    prevent an improper rotation from being used."""
    gt = rng.normal(size=(3, 17, 3)).astype(np.float64) * 100
    pred = gt.copy()
    pred[..., 0] *= -1  # mirror
    expected = _numpy_pa_mpjpe(pred, gt)
    got = float(pa_mpjpe(pred.astype(np.float32), gt.astype(np.float32)))
    assert np.isclose(got, expected, rtol=1e-3, atol=1e-2)
    # mirrored poses cannot be perfectly aligned by a proper rotation
    assert got > 1.0


def test_pa_mpjpe_degenerate_pred():
    """All-equal prediction (zero variance) should use s=1 fallback and not
    produce NaN (reference src/utils.py:150-154)."""
    gt = rng.normal(size=(2, 17, 3)).astype(np.float32) * 10
    pred = np.ones((2, 17, 3), np.float32) * 5.0
    got = float(pa_mpjpe(pred, gt))
    assert np.isfinite(got)


def test_procrustes_align_shape():
    pred = rng.normal(size=(5, 17, 3)).astype(np.float32)
    gt = rng.normal(size=(5, 17, 3)).astype(np.float32)
    out = np.asarray(procrustes_align(pred, gt))
    assert out.shape == (5, 17, 3)


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        mpjpe(np.zeros((2, 17, 3)), np.zeros((2, 16, 3)))
    with pytest.raises(ValueError):
        pa_mpjpe(np.zeros((2, 17, 3)), np.zeros((3, 17, 3)))
