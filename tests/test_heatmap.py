"""Heatmap rendering tests vs. the reference spec (src/models/common.py:6-51)."""

import numpy as np

from pose3d_tpu.ops import gaussian_heatmaps
from pose3d_tpu.ops.heatmap import gaussian_heatmaps_nchw

rng = np.random.default_rng(3)


def _numpy_heatmaps(kpts, size, sigma):
    """Direct transcription of the reference formula (full broadcast)."""
    B, J, _ = kpts.shape
    coords = np.arange(size, dtype=np.float64)
    yg, xg = np.meshgrid(coords, coords, indexing="ij")
    mu = kpts * (size - 1)
    out = np.zeros((B, J, size, size))
    for b in range(B):
        for j in range(J):
            d2 = (xg - mu[b, j, 0]) ** 2 + (yg - mu[b, j, 1]) ** 2
            out[b, j] = np.exp(-d2 / (2 * sigma ** 2))
            if not np.all(kpts[b, j] > 0):
                out[b, j] = 0.0
    return out


def test_matches_reference_formula():
    kpts = rng.uniform(0.05, 0.95, size=(2, 5, 2)).astype(np.float32)
    size, sigma = 32, 2.0
    expected = _numpy_heatmaps(kpts.astype(np.float64), size, sigma)
    got = np.asarray(gaussian_heatmaps_nchw(kpts, size, sigma))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_peak_location_and_value():
    kpts = np.array([[[0.5, 0.25]]], np.float32)  # x=0.5, y=0.25
    size = 65
    hm = np.asarray(gaussian_heatmaps(kpts, size, 2.0))  # [1, S, S, 1]
    peak = np.unravel_index(hm[0, :, :, 0].argmax(), (size, size))
    assert peak == (16, 32)  # (row=y, col=x) at mu = kpt*(S-1)
    assert np.isclose(hm[0, 16, 32, 0], 1.0, atol=1e-5)


def test_invalid_keypoints_zeroed():
    kpts = np.array([[[0.5, 0.5], [-0.1, 0.5], [0.0, 0.3], [0.4, 0.0]]], np.float32)
    hm = np.asarray(gaussian_heatmaps(kpts, 16, 2.0))
    assert hm[0, :, :, 0].max() > 0.9  # peak falls between grid points
    assert np.all(hm[0, :, :, 1] == 0)  # negative x
    assert np.all(hm[0, :, :, 2] == 0)  # zero x (<= 0 is invalid)
    assert np.all(hm[0, :, :, 3] == 0)  # zero y


def test_nhwc_layout():
    kpts = rng.uniform(0.1, 0.9, size=(3, 17, 2)).astype(np.float32)
    hm = np.asarray(gaussian_heatmaps(kpts, 64, 2.0))
    assert hm.shape == (3, 64, 64, 17)


def test_bfloat16_output():
    import jax.numpy as jnp

    kpts = rng.uniform(0.1, 0.9, size=(1, 17, 2)).astype(np.float32)
    hm = gaussian_heatmaps(kpts, 64, 2.0, dtype=jnp.bfloat16)
    assert hm.dtype == jnp.bfloat16
