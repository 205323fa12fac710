"""Augmentation consistency tests: each transform must keep image, depth,
2D keypoints and 3D joints mutually consistent."""

import numpy as np

from pose3d_tpu.data.augment import PoseAugmentor

rng = np.random.default_rng(0)


def _sample(h=40, w=40):
    return {
        "image": rng.uniform(size=(h, w, 3)).astype(np.float32),
        "depth": rng.uniform(1, 5, size=(h, w, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.2, 0.8, size=(17, 2)).astype(np.float32),
        "joints_3d": (rng.normal(size=(17, 3)) * 100).astype(np.float32),
        "camera_params": {"R": np.eye(3).tolist(), "t": [0, 0, 0],
                          "f": [1000.0, 1000.0], "c": [20.0, 20.0]},
    }


def _only(**flags):
    base = dict(enable_rotation=False, enable_flip=False, enable_scale=False,
                enable_translate=False, enable_color=False, seed=0)
    base.update(flags)
    return PoseAugmentor(**base)


def test_flip_consistency():
    aug = _only(enable_flip=True, flip_prob=1.0)
    s = _sample()
    out = aug(s)
    # image mirrored
    np.testing.assert_allclose(out["image"], s["image"][:, ::-1], atol=1e-6)
    # symmetric joints swapped and x negated: right hip (1) ↔ left hip (4)
    np.testing.assert_allclose(
        out["joints_3d"][1, 0], -s["joints_3d"][4, 0], atol=1e-6
    )
    np.testing.assert_allclose(
        out["joints_3d"][1, 1:], s["joints_3d"][4, 1:], atol=1e-6
    )
    # 2D x flipped
    np.testing.assert_allclose(
        out["keypoints_2d"][1, 0], 1.0 - s["keypoints_2d"][4, 0], atol=1e-6
    )
    # shapes static
    assert out["image"].shape == s["image"].shape


def test_flip_involution():
    aug = _only(enable_flip=True, flip_prob=1.0)
    s = _sample()
    twice = aug(aug(s))
    np.testing.assert_allclose(twice["joints_3d"], s["joints_3d"], atol=1e-5)
    np.testing.assert_allclose(
        twice["keypoints_2d"], s["keypoints_2d"], atol=1e-5
    )


def test_rotation_consistency():
    """2D keypoints must rotate with the image; 3D (x,y) norms and z are
    preserved."""
    aug = _only(enable_rotation=True, rotation_range=(25.0, 25.0))
    s = _sample()
    out = aug(s)
    assert out["image"].shape == s["image"].shape
    # z unchanged
    np.testing.assert_allclose(
        out["joints_3d"][:, 2], s["joints_3d"][:, 2], atol=1e-5
    )
    # xy norms preserved (rotation)
    np.testing.assert_allclose(
        np.linalg.norm(out["joints_3d"][:, :2], axis=1),
        np.linalg.norm(s["joints_3d"][:, :2], axis=1),
        rtol=1e-5,
    )
    # keypoint rotated about image center by the same angle
    h, w = 40, 40
    th = np.radians(25.0)
    pc = (s["keypoints_2d"] - 0.5) * [w, h]
    expected = np.stack(
        [pc[:, 0] * np.cos(th) + pc[:, 1] * np.sin(th),
         -pc[:, 0] * np.sin(th) + pc[:, 1] * np.cos(th)], 1
    ) / [w, h] + 0.5
    np.testing.assert_allclose(out["keypoints_2d"], expected, atol=1e-4)


def test_scale_consistency():
    aug = _only(enable_scale=True, scale_range=(0.5, 0.5))
    s = _sample()
    out = aug(s)
    assert out["image"].shape == s["image"].shape  # static canvas
    # normalized kpts scale by f about top-left
    np.testing.assert_allclose(
        out["keypoints_2d"], s["keypoints_2d"] * 0.5, atol=1e-6
    )
    # camera scaled
    assert out["camera_params"]["f"][0] == 500.0
    # bottom half of canvas is padding
    assert np.abs(out["image"][30:]).max() == 0.0
    # 3D unchanged
    np.testing.assert_allclose(out["joints_3d"], s["joints_3d"])


def test_translate_consistency():
    aug = _only(enable_translate=True, translate_range=(0.1, 0.1))
    s = _sample()
    out = aug(s)
    np.testing.assert_allclose(
        out["keypoints_2d"], s["keypoints_2d"] + 0.1, atol=1e-5
    )
    assert out["image"].shape == s["image"].shape


def test_color_only_touches_image():
    aug = _only(enable_color=True, brightness_range=(1.2, 1.2),
                contrast_range=(1.0, 1.0))
    s = _sample()
    out = aug(s)
    np.testing.assert_allclose(out["depth"], s["depth"])
    np.testing.assert_allclose(out["keypoints_2d"], s["keypoints_2d"])
    np.testing.assert_allclose(
        out["image"], np.clip(s["image"] * 1.2, 0, 1), atol=1e-6
    )


def test_full_pipeline_shapes_and_ranges():
    aug = PoseAugmentor(seed=1)
    s = _sample()
    out = aug(s)
    assert out["image"].shape == (40, 40, 3)
    assert out["depth"].shape == (40, 40, 1)
    assert out["keypoints_2d"].shape == (17, 2)
    assert out["joints_3d"].shape == (17, 3)
    assert out["image"].min() >= 0 and out["image"].max() <= 1
    assert np.all(np.isfinite(out["joints_3d"]))
