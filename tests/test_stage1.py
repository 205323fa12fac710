"""Stage-1 model and preprocess-CLI tests (CPU, tiny input sizes)."""

import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from pose3d_tpu.stage1.models import JaxStage1, KeypointNet, DepthNet
from pose3d_tpu.stage1.api import CachedStage1


@pytest.fixture(scope="module")
def provider():
    return JaxStage1(input_size=64)


@pytest.mark.slow
def test_keypointnet_shapes(provider):
    import jax.numpy as jnp

    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    kpts, heads = provider.kp_model.apply(provider.kp_vars, x, train=False)
    assert kpts.shape == (2, 17, 3)
    # heads at strides 8/16/32
    assert [h[0].shape for h in heads] == [(2, 8, 8), (2, 4, 4), (2, 2, 2)]
    assert heads[0][1].shape == (2, 8, 8, 17, 3)
    k = np.asarray(kpts)
    assert np.all(k[..., 2] >= 0) and np.all(k[..., 2] <= 1)  # sigmoid conf


def test_multi_person_decode(provider):
    import jax
    import jax.numpy as jnp
    from pose3d_tpu.stage1.models import decode_persons

    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 64, 3)), jnp.float32
    )
    _, heads = provider.kp_model.apply(provider.kp_vars, x, train=False)
    persons, conf = jax.jit(
        lambda h: decode_persons(h, max_persons=3, conf_threshold=0.0,
                                 nms_radius=0.2)
    )(heads)
    assert persons.shape == (2, 3, 17, 3)
    assert conf.shape == (2, 3)
    # scores descending per image
    c = np.asarray(conf)
    assert np.all(np.diff(c, axis=1) <= 1e-6)
    # surviving detections are separated by at least the NMS radius
    cen = np.asarray(persons[..., :2].mean(axis=2))  # [B, P, 2] mean joint
    for b in range(2):
        alive = c[b] > 0
        pts = cen[b][alive]
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                # centers come from distinct cells (mean-joint proxies can
                # be close, so just check they are not identical)
                assert not np.allclose(pts[i], pts[j])


def test_depthnet_positive(provider):
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    d = provider.depth_model.apply(provider.depth_vars, x, train=False)
    assert d.shape == (1, 64, 64)
    assert np.all(np.asarray(d) > 0)  # metric depth is positive


def test_jax_stage1_predict_batch(provider):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
            for _ in range(3)]
    results = provider.predict_batch(imgs)
    assert len(results) == 3
    for r, im in zip(results, imgs):
        assert r.keypoints.shape == (17, 3)
        assert r.depth.shape == im.shape[:2]
        assert r.depth_min <= r.depth_max


def test_preprocess_cli_end_to_end(tmp_path, provider, monkeypatch):
    """Drive the preprocess CLI on a folder tree; verify artifact format
    matches what CachedStage1 / the chunker expect."""
    from pose3d_tpu.cli import preprocess as pp

    rng = np.random.default_rng(1)
    in_base = tmp_path / "raw"
    sub = in_base / "s_01_act_02"
    sub.mkdir(parents=True)
    for i in range(3):
        img = rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
        cv2.imwrite(str(sub / f"frame_{i}.jpg"), img)
    out_base = tmp_path / "proc"

    monkeypatch.setattr(
        "pose3d_tpu.stage1.models.JaxStage1", lambda **kw: provider
    )
    n = pp.main([str(in_base), str(out_base), "--allow-untrained", "--batch-size", "2",
                 "--input-size", "64"])
    assert n == 3
    out_dir = out_base / "s_01_act_02"
    assert (out_dir / "finished.txt").exists()
    for i in range(3):
        depth_png = out_dir / f"frame_{i}_depth.png"
        meta_json = out_dir / f"frame_{i}.json"
        assert depth_png.exists() and meta_json.exists()
        meta = json.loads(meta_json.read_text())
        assert meta["image_size"] == [50, 40]
        assert len(meta["keypoints"][0]) == 17
        assert "depth_min" in meta and "depth_max" in meta
        d = cv2.imread(str(depth_png), cv2.IMREAD_GRAYSCALE)
        assert d.shape == (40, 50)

    # artifacts consumable by the cached provider (infer path)
    cached = CachedStage1()
    res = cached.predict_one(sub / "frame_0.jpg".replace("raw", "proc"))
    # cached provider looks next to the image; emulate by copying image
    import shutil

    shutil.copyfile(sub / "frame_0.jpg", out_dir / "frame_0.jpg")
    res = cached.predict_one(out_dir / "frame_0.jpg")
    assert res is not None
    assert res.keypoints.shape == (17, 3)
    meta0 = json.loads((out_dir / "frame_0.json").read_text())
    np.testing.assert_allclose(res.depth_max, meta0["depth_max"], rtol=1e-5)

    # resume: re-running does nothing (finished.txt)
    n2 = pp.main([str(in_base), str(out_base), "--allow-untrained", "--input-size", "64"])
    assert n2 == 0


def test_confidence_threshold_applied():
    """Unlike the reference (flag accepted, never applied), the threshold
    zeroes low-confidence keypoints so the heatmap validity mask drops
    them."""
    strict = JaxStage1(input_size=64, confidence_threshold=2.0)  # > any conf
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    res = strict.predict_batch([img])[0]
    assert np.all(res.keypoints == 0.0)
