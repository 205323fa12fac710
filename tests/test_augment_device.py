"""Device-side augmentation (ops/augment_device) vs the host augmentor
(data/augment.py, the reference-parity path).

Parameter randomness is pinned by degenerate ranges (lo == hi) and
flip_prob=1.0 so both implementations apply identical transforms; then:
  * keypoints_2d / joints_3d must match the host formulas exactly,
  * images match exactly where the operation is exact (flip, integer
    translate, color) and to interior-pixel tolerance where the device's
    single-resample differs sub-pixel from the host's chained cv2 warps
    (rotation, scale).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.data.augment import PoseAugmentor
from pose3d_tpu.ops.augment_device import (
    DeviceAugmentConfig,
    make_device_augment,
)

H = W = 48
J = 17


def _sample(rng):
    """Smooth low-frequency image (keeps resampler differences small) +
    random geometry."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(2 * np.pi * (xx / W + 0.3 * k))
            * np.cos(2 * np.pi * (yy / H - 0.2 * k))
            for k in range(3)
        ],
        -1,
    ).astype(np.float32)
    img = np.clip(img + rng.normal(scale=0.01, size=img.shape), 0, 1)
    img = img.astype(np.float32)
    depth = (
        2.0 + 3.0 * (xx / W) + 1.5 * (yy / H)
    )[..., None].astype(np.float32)
    kpts = rng.uniform(0.15, 0.85, size=(J, 2)).astype(np.float32)
    joints = (rng.normal(size=(J, 3)) * 120).astype(np.float32)
    return {
        "image": img, "depth": depth,
        "keypoints_2d": kpts, "joints_3d": joints,
    }


def _off():
    return dict(
        enable_rotation=False, enable_flip=False, enable_scale=False,
        enable_translate=False, enable_color=False,
    )


def _run_both(host_kw, dev_kw, seed=0):
    rng = np.random.default_rng(seed)
    s = _sample(rng)
    host = PoseAugmentor(seed=1, **{**_off(), **host_kw})(dict(s))
    cfg = DeviceAugmentConfig(**{**_off(), **dev_kw})
    aug = jax.jit(make_device_augment(cfg))
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    dev = jax.device_get(aug(batch, jax.random.PRNGKey(2)))
    dev = {k: np.asarray(v[0]) for k, v in dev.items()}
    return host, dev


def _assert_geom(host, dev, tol=1e-5):
    np.testing.assert_allclose(
        dev["keypoints_2d"], host["keypoints_2d"], rtol=0, atol=tol,
        err_msg="keypoints_2d",
    )
    np.testing.assert_allclose(
        dev["joints_3d"], host["joints_3d"], rtol=0, atol=tol * 100,
        err_msg="joints_3d",
    )


def _interior(x, m=6):
    return x[m:-m, m:-m]


def test_flip_exact():
    host, dev = _run_both(
        {"enable_flip": True, "flip_prob": 1.0},
        {"enable_flip": True, "flip_prob": 1.0},
    )
    _assert_geom(host, dev)
    np.testing.assert_allclose(dev["image"], host["image"], atol=1e-6)
    np.testing.assert_allclose(dev["depth"], host["depth"], atol=1e-6)


def test_rotation_geometry_exact_image_close():
    kw = {"enable_rotation": True, "rotation_range": (17.3, 17.3)}
    host, dev = _run_both(kw, kw)
    _assert_geom(host, dev)
    d = np.abs(_interior(dev["image"]) - _interior(host["image"]))
    assert d.mean() < 0.02 and d.max() < 0.35, (d.mean(), d.max())


@pytest.mark.parametrize("f", [0.85, 1.15])
def test_scale_geometry_exact_image_close(f):
    kw = {"enable_scale": True, "scale_range": (f, f)}
    host, dev = _run_both(kw, kw)
    _assert_geom(host, dev)
    d = np.abs(_interior(dev["image"]) - _interior(host["image"]))
    assert d.mean() < 0.03, d.mean()
    if f < 1:
        # padded region beyond the scaled content is zero on both sides
        assert np.abs(dev["image"][:, -3:]).max() < 1e-6
        assert np.abs(host["image"][:, -3:]).max() < 1e-6


def test_scale_up_negative_translate_border():
    """Regression (review finding): scale-up (f>1) CROPS to the canvas,
    so a later negative translation must expose border zeros — the
    composed affine would otherwise see through the intermediate crop to
    content the host path discarded. 0.8*1.15*48 is fractional so both
    paths' seams align via the min(W, floor(W*f)) box."""
    kw = {
        "enable_scale": True, "scale_range": (1.15, 1.15),
        "enable_translate": True, "translate_range": (-0.125, -0.125),
    }
    host, dev = _run_both(kw, kw)
    _assert_geom(host, dev)
    # the host's re-exposed border is exactly zero; the device must match
    # there (this was the bug: unclamped mask leaked cropped-away content
    # with max diff 0.98); the interior differs only by cv2.resize's
    # fixed-point bilinear quantization (~1/32)
    assert np.abs(host["image"][:, -5:]).max() == 0.0
    assert np.abs(dev["image"][:, -5:]).max() == 0.0
    assert np.abs(host["image"][-5:]).max() == 0.0
    assert np.abs(dev["image"][-5:]).max() == 0.0
    d = np.abs(dev["image"] - host["image"])
    assert d.max() < 0.05 and d.mean() < 0.01, (d.max(), d.mean())


def test_translate_integer_exact():
    # 0.125 * 48 = 6 px exactly -> bilinear shift is an exact copy
    kw = {"enable_translate": True, "translate_range": (0.125, 0.125)}
    host, dev = _run_both(kw, kw)
    _assert_geom(host, dev)
    np.testing.assert_allclose(dev["image"], host["image"], atol=1e-5)
    np.testing.assert_allclose(dev["depth"], host["depth"], atol=1e-5)


def test_color_exact():
    kw = {
        "enable_color": True,
        "brightness_range": (1.13, 1.13),
        "contrast_range": (0.87, 0.87),
    }
    host, dev = _run_both(kw, kw)
    np.testing.assert_allclose(dev["image"], host["image"], atol=1e-5)


def test_blob_follows_keypoint():
    """Self-consistency with everything enabled: a bright blob painted at
    a keypoint must land (argmax) where the transformed keypoint says."""
    rng = np.random.default_rng(3)
    s = _sample(rng)
    kp = np.array([0.4, 0.6], np.float32)
    s["keypoints_2d"][0] = kp
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    blob = np.exp(
        -((xx - kp[0] * W) ** 2 + (yy - kp[1] * H) ** 2) / (2 * 1.5**2)
    )
    s["image"] = np.clip(
        0.2 * s["image"] + 0.8 * blob[..., None], 0, 1
    ).astype(np.float32)

    aug = jax.jit(make_device_augment(DeviceAugmentConfig(
        enable_color=False,
        rotation_range=(-25.0, 25.0),
        scale_range=(0.9, 1.1),
        translate_range=(-0.05, 0.05),
    )))
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    for seed in range(4):
        out = jax.device_get(aug(batch, jax.random.PRNGKey(seed)))
        img = np.asarray(out["image"][0]).sum(-1)
        kp2 = np.asarray(out["keypoints_2d"][0, 0])
        if not (0.1 < kp2[0] < 0.9 and 0.1 < kp2[1] < 0.9):
            continue
        py, px = np.unravel_index(np.argmax(img), img.shape)
        assert abs(px - kp2[0] * W) <= 2.0, (seed, px, kp2[0] * W)
        assert abs(py - kp2[1] * H) <= 2.0, (seed, py, kp2[1] * H)


def test_separable_matches_gather_path():
    """The MXU separable warp (auto when rotation is off) must equal the
    general gather path bit-for-bit in fp32 (same bilinear/nearest math,
    different execution strategy)."""
    rng = np.random.default_rng(11)
    s = _sample(rng)
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    kw = dict(
        enable_rotation=False,
        flip_prob=0.5,
        scale_range=(0.82, 1.17),
        translate_range=(-0.07, 0.07),
    )
    fast = jax.jit(make_device_augment(DeviceAugmentConfig(**kw)))
    slow = jax.jit(
        make_device_augment(DeviceAugmentConfig(resample="gather", **kw))
    )
    for seed in range(3):
        a = jax.device_get(fast(batch, jax.random.PRNGKey(seed)))
        b = jax.device_get(slow(batch, jax.random.PRNGKey(seed)))
        for k in ("image", "depth", "keypoints_2d", "joints_3d"):
            np.testing.assert_allclose(
                a[k], b[k], rtol=0, atol=1e-5, err_msg=f"{k}@{seed}"
            )


def test_lane_resample_matches_map_coordinates():
    """The Pallas lane-resample kernel (interpret mode on CPU) must
    reproduce map_coordinates exactly for both orders, including odd
    (non-128-multiple) widths and out-of-range constant-0 edges."""
    from jax.scipy import ndimage as jndi

    from pose3d_tpu.ops.pallas.lane_resample import lane_resample

    rng = np.random.default_rng(0)
    for w in (50, 200, 500):
        x = jnp.asarray(rng.uniform(size=(13, w)).astype(np.float32))
        a = jnp.asarray(
            rng.uniform(0.7, 1.3, size=(13,)).astype(np.float32)
        )
        o = jnp.asarray(
            rng.uniform(-w * 0.3, w * 0.3, size=(13,)).astype(np.float32)
        )
        j = np.arange(w, dtype=np.float32)
        for order in (0, 1):
            got = np.asarray(
                lane_resample(x, a, o, order=order, interpret=True)
            )
            ref = np.stack([
                np.asarray(jndi.map_coordinates(
                    x[i], [np.asarray(a)[i] * j + np.asarray(o)[i]],
                    order=order, mode="constant", cval=0.0,
                ))
                for i in range(13)
            ])
            # atol 2e-4: the kernel computes positions a*iota+o on-device
            # in fp32; sub-ulp position differences vs the host reference
            # scale by the local image gradient at tap boundaries
            np.testing.assert_allclose(
                got, ref, atol=2e-4, err_msg=f"w={w} order={order}"
            )


def test_kernel_twopass_close_to_gather():
    """The two-pass kernel warp (rotation path) vs the exact single-pass
    gather: sub-pixel two-pass shear approximation only — small on
    smooth images, geometry identical."""
    rng = np.random.default_rng(13)
    s = _sample(rng)
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    kw = dict(
        enable_color=False,
        rotation_range=(-28.0, -28.0),
        scale_range=(1.1, 1.1),
        translate_range=(0.04, 0.04),
        flip_prob=1.0,
    )
    kern = jax.jit(make_device_augment(DeviceAugmentConfig(**kw)))
    gath = jax.jit(
        make_device_augment(DeviceAugmentConfig(resample="gather", **kw))
    )
    a = jax.device_get(kern(batch, jax.random.PRNGKey(1)))
    b = jax.device_get(gath(batch, jax.random.PRNGKey(1)))
    np.testing.assert_allclose(
        a["keypoints_2d"], b["keypoints_2d"], atol=1e-6
    )
    np.testing.assert_allclose(a["joints_3d"], b["joints_3d"], atol=1e-4)
    d = np.abs(a["image"] - b["image"])
    assert d.mean() < 0.01 and d.max() < 0.2, (d.mean(), d.max())


def test_per_sample_variety_and_determinism():
    rng = np.random.default_rng(5)
    s1, s2 = _sample(rng), _sample(rng)
    batch = {
        k: jnp.stack([jnp.asarray(s1[k]), jnp.asarray(s1[k])])
        for k in s1
    }
    aug = jax.jit(make_device_augment())
    a = jax.device_get(aug(batch, jax.random.PRNGKey(0)))
    b = jax.device_get(aug(batch, jax.random.PRNGKey(0)))
    # deterministic given the key
    np.testing.assert_allclose(a["image"], b["image"])
    # identical inputs, different per-sample draws
    assert np.abs(a["image"][0] - a["image"][1]).max() > 0.05
    del s2


def test_train_step_with_device_augment():
    """Integration: the train step runs the augmenter in-jit (grouped and
    scan modes), finite loss, and the no-augment step is untouched."""
    import optax

    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.step import make_train_step

    cfg = CNNModelConfig(
        image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
        stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
        initial_channels=8, global_pool_size=2, global_feature_dim=16,
        regression_dims=(16,),
    )
    model, variables = init_model(cfg, batch_size=2)
    state = create_train_state(model, variables, tx=optax.sgd(1e-3))
    rng = np.random.default_rng(7)
    batch = {
        "image": rng.uniform(size=(2, 2, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(2, 2, 32, 32, 1)).astype(
            np.float32
        ),
        "keypoints_2d": rng.uniform(
            0.1, 0.9, size=(2, 2, J, 2)
        ).astype(np.float32),
        "joints_3d": (rng.normal(size=(2, 2, J, 3)) * 100).astype(
            np.float32
        ),
    }
    aug = make_device_augment()
    for mode in ("grouped", "ghost", "scan"):
        step = make_train_step(
            model, donate=False, accum_mode=mode, augment=aug
        )
        _, m = jax.device_get(
            step(state, batch, jax.random.PRNGKey(0))
        )
        assert np.isfinite(m["total_loss"]), mode
