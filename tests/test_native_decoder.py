"""Native C++ decoder vs cv2 reference (skipped when the library isn't
built; CI builds it with `make -C native`)."""

import cv2
import numpy as np
import pytest

from pose3d_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="libposedec.so not built"
)

rng = np.random.default_rng(0)


def _jpeg_blob(h, w):
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    return bytes(enc), img


def _png_blob(h, w):
    img = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    ok, enc = cv2.imencode(".png", img)
    assert ok
    return bytes(enc), img


def test_jpeg_batch_matches_cv2():
    # 37×53 → 32×32 cannot use DCT scaling (≤2× would undershoot), so it
    # must match cv2's full-decode+resize closely; 64×64 → 32×32 decodes
    # at 1/2 scale in the DCT domain, which differs more on noise images
    # (worst case for frequency-domain downscaling).
    blobs, raws = zip(*[_jpeg_blob(37, 53), _jpeg_blob(64, 64)])
    out, ok = native.decode_jpeg_batch(list(blobs), (32, 32))
    assert out.shape == (2, 32, 32, 3)
    assert ok.tolist() == [True, True]
    mean_bounds = [0.02, 0.09]
    for i, blob in enumerate(blobs):
        dec = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
        dec = cv2.cvtColor(dec, cv2.COLOR_BGR2RGB)
        ref = cv2.resize(dec, (32, 32), interpolation=cv2.INTER_LINEAR)
        ref = ref.astype(np.float32) / 255.0
        assert np.abs(out[i] - ref).mean() < mean_bounds[i]


def test_png_gray_batch_matches_cv2():
    blobs, raws = zip(*[_png_blob(40, 50), _png_blob(20, 20)])
    out, ok = native.decode_png_gray_batch(list(blobs), (16, 16))
    assert out.shape == (2, 16, 16, 1)
    assert ok.all()
    for i, (blob, raw) in enumerate(zip(blobs, raws)):
        ref = cv2.resize(raw, (16, 16), interpolation=cv2.INTER_LINEAR)
        ref = (ref.astype(np.float32) / 255.0)[..., None]
        assert np.abs(out[i] - ref).mean() < 0.02


def test_png_lossless_identity():
    """PNG is lossless: decoding at native size must be exact."""
    blob, raw = _png_blob(24, 24)
    out, _ = native.decode_png_gray_batch([blob], (24, 24))
    np.testing.assert_allclose(
        out[0, ..., 0], raw.astype(np.float32) / 255.0, atol=1e-6
    )


def test_corrupt_blob_flagged_and_zero_filled():
    good, _ = _jpeg_blob(16, 16)
    out, ok = native.decode_jpeg_batch([b"not a jpeg", good], (8, 8))
    assert ok.tolist() == [False, True]
    assert np.all(out[0] == 0)
    assert out[1].max() > 0


def test_all_black_jpeg_is_valid():
    """An all-black frame decodes with ok=True — per-slot flags, not the
    old max()==0 heuristic, are the failure signal (review finding)."""
    black = np.zeros((16, 16, 3), np.uint8)
    okenc, enc = cv2.imencode(".jpg", black)
    assert okenc
    out, ok = native.decode_jpeg_batch([bytes(enc)], (8, 8))
    assert ok.tolist() == [True]
    assert np.all(out[0] == 0)


def test_large_batch_threads():
    blobs = [_jpeg_blob(30, 30)[0] for _ in range(32)]
    out, ok = native.decode_jpeg_batch(blobs, (16, 16), num_threads=4)
    assert out.shape == (32, 16, 16, 3)
    assert ok.all()
    assert np.all(out.max(axis=(1, 2, 3)) > 0)
