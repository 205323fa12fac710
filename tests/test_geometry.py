"""Golden-value tests for camera geometry against plain numpy formulas."""

import numpy as np
import pytest

from pose3d_tpu.geometry import (
    world_to_camera,
    camera_to_pixel,
    normalize_depth,
    root_center,
)
from pose3d_tpu.geometry.camera import denormalize_depth, project_with_validity


rng = np.random.default_rng(0)


def _random_rotation():
    # QR of a random matrix gives an orthonormal basis
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_world_to_camera_matches_numpy():
    R = _random_rotation()
    t = rng.normal(size=3) * 100
    pts = rng.normal(size=(17, 3)) * 1000
    expected = (R @ pts.reshape(-1, 3, 1)).reshape(-1, 3) + t
    got = np.asarray(world_to_camera(pts, R, t))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-3)


def test_world_to_camera_batched():
    R = _random_rotation()
    t = rng.normal(size=3)
    pts = rng.normal(size=(4, 17, 3))
    got = np.asarray(world_to_camera(pts, R, t))
    for b in range(4):
        expected = pts[b] @ R.T + t
        np.testing.assert_allclose(got[b], expected, rtol=1e-5, atol=1e-4)


def test_camera_to_pixel_matches_loop():
    f = np.array([1145.0, 1143.8])
    c = np.array([512.5, 515.4])
    pts = rng.normal(size=(17, 3))
    pts[:, 2] = np.abs(pts[:, 2]) + 2.0  # in front of camera
    pts *= 1000
    # the reference's per-joint loop (src/utils.py:26-46)
    expected = np.stack(
        [
            [x * f[0] / z + c[0], y * f[1] / z + c[1]]
            for x, y, z in pts
        ]
    )
    got = np.asarray(camera_to_pixel(pts, f, c))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-3)


def test_project_with_validity_behind_camera():
    f = np.array([1000.0, 1000.0])
    c = np.array([500.0, 500.0])
    pts = np.array([[100.0, 50.0, 2000.0], [10.0, 10.0, -5.0], [0.0, 0.0, 0.0]])
    got = np.asarray(project_with_validity(pts, f, c))
    np.testing.assert_allclose(got[0], [100 * 0.5 + 500, 50 * 0.5 + 500])
    np.testing.assert_allclose(got[1], [-1.0, -1.0])
    np.testing.assert_allclose(got[2], [-1.0, -1.0])


def test_depth_normalize_roundtrip():
    d = rng.uniform(1.0, 9.0, size=(8, 8)).astype(np.float32)
    lo, hi = 1.0, 9.0
    n = np.asarray(normalize_depth(d, lo, hi))
    assert n.min() >= 0 and n.max() <= 1
    back = np.asarray(denormalize_depth(n, lo, hi))
    np.testing.assert_allclose(back, d, rtol=1e-6, atol=1e-5)


def test_root_center():
    joints = rng.normal(size=(2, 17, 3)).astype(np.float32)
    out = np.asarray(root_center(joints))
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        out, joints - joints[:, :1], rtol=1e-6, atol=1e-6
    )
