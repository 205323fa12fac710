"""uint8-native pipeline mode: decoded pixels stay bytes from the decoder
through the prefetch queue and the host→device transfer, with the [0,1] /
metric-depth decode on-device (train.step.decompact_batch).

Covers: native/cv2 uint8 decode parity with the float path, uint8 chunk
decode records, dtype-aware collation (+ depth_scale emission), on-device
decompaction equivalence, host-augmentor entry conversion, and the
end-to-end loader → superbatch path."""

import numpy as np
import pytest

from tests.helpers_synthetic import make_synthetic_chunk

from pose3d_tpu.data import native
from pose3d_tpu.data.chunks import decode_chunk_samples, open_chunk_store
from pose3d_tpu.data.collate import (
    collate_fixed,
    compact_batch,
    sample_pixels_to_float,
)
from pose3d_tpu.data.pipeline import BatchLoader, StreamingChunkedDataset


def _encode_jpeg(img_rgb):
    import cv2

    ok, buf = cv2.imencode(
        ".jpg", cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR),
        [cv2.IMWRITE_JPEG_QUALITY, 95],
    )
    assert ok
    return buf.tobytes()


def _encode_png(gray):
    import cv2

    ok, buf = cv2.imencode(".png", gray)
    assert ok
    return buf.tobytes()


def test_decode_jpeg_batch_uint8_matches_float():
    rng = np.random.default_rng(0)
    blobs = [
        _encode_jpeg(rng.integers(0, 255, (37, 53, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    f32, ok_f = native.decode_jpeg_batch(blobs, (24, 32))
    u8, ok_u = native.decode_jpeg_batch(blobs, (24, 32), dtype=np.uint8)
    assert ok_f.all() and ok_u.all()
    assert u8.dtype == np.uint8 and u8.shape == (4, 24, 32, 3)
    # same interpolation, independent rounding → at most 1 LSB apart
    assert (
        np.abs(u8.astype(np.int16) - np.round(f32 * 255).astype(np.int16))
        .max() <= 1
    )


def test_decode_png_batch_uint8_matches_float():
    rng = np.random.default_rng(1)
    blobs = [
        _encode_png(rng.integers(0, 255, (41, 29), dtype=np.uint8))
        for _ in range(3)
    ]
    f32, ok_f = native.decode_png_gray_batch(blobs, (20, 16))
    u8, ok_u = native.decode_png_gray_batch(blobs, (20, 16), dtype=np.uint8)
    assert ok_f.all() and ok_u.all()
    assert u8.dtype == np.uint8 and u8.shape == (3, 20, 16, 1)
    assert (
        np.abs(u8.astype(np.int16) - np.round(f32 * 255).astype(np.int16))
        .max() <= 1
    )


def test_decode_uint8_bad_blob_flags():
    u8, ok = native.decode_jpeg_batch([b"not a jpeg"], (8, 8),
                                      dtype=np.uint8)
    assert not ok[0]
    assert (u8 == 0).all()


@pytest.fixture
def chunk(tmp_path):
    tar, samples = make_synthetic_chunk(tmp_path, 0, num_samples=6,
                                        image_hw=(40, 50))
    return tar, samples


def _decode_both(chunk, tmp_path):
    tar, samples = chunk
    store = open_chunk_store(tar, tmp_path / "cache")
    recs_f = decode_chunk_samples(samples, store, (40, 50))
    recs_u = decode_chunk_samples(samples, store, (40, 50),
                                  pixel_dtype="uint8")
    assert len(recs_f) == len(recs_u) == len(samples)
    return recs_f, recs_u


def test_decode_chunk_samples_uint8(chunk, tmp_path):
    recs_f, recs_u = _decode_both(chunk, tmp_path)
    for rf, ru in zip(recs_f, recs_u):
        assert ru["image"].dtype == np.uint8
        assert ru["depth"].dtype == np.uint8
        np.testing.assert_allclose(
            ru["image"].astype(np.float32) / 255.0, rf["image"],
            atol=1.5 / 255.0,
        )
        dmin, dmax = ru["depth_min"], ru["depth_max"]
        metric = ru["depth"].astype(np.float32) / 255.0 * (dmax - dmin) + dmin
        np.testing.assert_allclose(
            metric, rf["depth"], atol=1.5 / 255.0 * (dmax - dmin)
        )
        np.testing.assert_array_equal(ru["joints_3d"], rf["joints_3d"])
        np.testing.assert_array_equal(ru["keypoints_2d"], rf["keypoints_2d"])


def test_collate_uint8_emits_depth_scale(chunk, tmp_path):
    recs_f, recs_u = _decode_both(chunk, tmp_path)
    bu = collate_fixed(recs_u, (40, 50))
    bf = collate_fixed(recs_f, (40, 50))
    assert bu["image"].dtype == np.uint8
    assert bu["depth"].dtype == np.uint8
    assert bu["depth_scale"].shape == (len(recs_u), 2)
    assert "depth_scale" not in bf
    # compact_batch passes a uint8 batch through untouched
    cb = compact_batch(bu)
    np.testing.assert_array_equal(cb["image"], bu["image"])
    np.testing.assert_array_equal(cb["depth_scale"], bu["depth_scale"])

    # on-device decode of the uint8 batch reproduces the float batch
    import jax.numpy as jnp  # noqa: F401
    from pose3d_tpu.train.step import decompact_batch

    dec = decompact_batch({k: bu[k] for k in
                           ("image", "depth", "depth_scale")})
    np.testing.assert_allclose(
        np.asarray(dec["image"]), bf["image"], atol=1.5 / 255.0
    )
    rng = bu["depth_scale"][:, 1] - bu["depth_scale"][:, 0]
    np.testing.assert_allclose(
        np.asarray(dec["depth"]), bf["depth"],
        atol=float(rng.max()) * 1.5 / 255.0,
    )


def test_collate_mixed_dtypes_promotes_to_float(chunk, tmp_path):
    recs_f, recs_u = _decode_both(chunk, tmp_path)
    mixed = [recs_u[0], recs_f[1], recs_u[2]]
    b = collate_fixed(mixed, (40, 50))
    assert b["image"].dtype == np.float32
    assert b["depth"].dtype == np.float32
    assert "depth_scale" not in b
    np.testing.assert_allclose(
        b["image"][0], recs_u[0]["image"].astype(np.float32) / 255.0
    )


def test_augmentor_uint8_entry_matches_float(chunk, tmp_path):
    from pose3d_tpu.data.augment import PoseAugmentor

    recs_f, recs_u = _decode_both(chunk, tmp_path)
    converted = sample_pixels_to_float(recs_u[0])
    out_u = PoseAugmentor(seed=7)(recs_u[0])
    out_f = PoseAugmentor(seed=7)(converted)
    np.testing.assert_array_equal(out_u["image"], out_f["image"])
    np.testing.assert_array_equal(out_u["depth"], out_f["depth"])
    np.testing.assert_array_equal(out_u["keypoints_2d"],
                                  out_f["keypoints_2d"])
    assert out_u["image"].dtype == np.float32


def test_streaming_loader_uint8_end_to_end(tmp_path):
    from pose3d_tpu.train.loop import _superbatches
    from pose3d_tpu.train.step import decompact_batch

    make_synthetic_chunk(tmp_path / "chunks", 0, num_samples=8,
                         image_hw=(40, 50))
    ds = StreamingChunkedDataset(
        "train", tmp_path / "chunks", image_size=(40, 50),
        cache_dir=tmp_path / "cache", shuffle=False, shuffle_chunks=False,
        pixel_dtype="uint8",
    )
    loader = BatchLoader(ds, batch_size=2)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b["image"].dtype == np.uint8
        assert b["depth"].dtype == np.uint8
        assert b["depth_scale"].shape == (2, 2)
    supers = list(_superbatches(iter(batches), accum=2))
    assert len(supers) == 2
    sb = supers[0]
    assert sb["image"].dtype == np.uint8
    assert sb["image"].shape == (2, 2, 40, 50, 3)
    assert sb["depth_scale"].shape == (2, 2, 2)
    micro = decompact_batch(
        {k: sb[k][0] for k in ("image", "depth", "depth_scale")}
    )
    img = np.asarray(micro["image"])
    dep = np.asarray(micro["depth"])
    assert img.dtype == np.float32 and 0.0 <= img.min() and img.max() <= 1.0
    # synthetic depth_min/max are 1.5/7.5 — decoded depth must be metric
    assert dep.min() >= 1.5 - 1e-5 and dep.max() <= 7.5 + 1e-5
    assert dep.max() > 2.0
