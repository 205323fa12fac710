"""Streaming chunk-store tests: the native in-memory archive reader
(native/chunkio.cc), the Python tarfile fallback, and the extract-to-disk
path must all decode bit-identically (round-3 native data-loader tier;
replaces the reference's mandatory tar.extractall,
reference src/dataset/chunked_dataset.py:329-341)."""

import io
import tarfile

import numpy as np
import pytest

from helpers_synthetic import make_synthetic_chunk

from pose3d_tpu.data import native
from pose3d_tpu.data.chunks import (
    DirChunkStore,
    MemoryChunkStore,
    decode_chunk_samples,
    extract_chunk,
    open_chunk_store,
)


@pytest.fixture(scope="module")
def chunk(tmp_path_factory):
    root = tmp_path_factory.mktemp("store_chunks")
    tar_path, samples = make_synthetic_chunk(
        root, 3, num_samples=5, image_hw=(40, 50), prefix="train"
    )
    return tar_path, samples


def _decoded_fields(records):
    return [
        {
            "image": r["image"],
            "depth": r["depth"],
            "keypoints_2d": r["keypoints_2d"],
            "joints_3d": r["joints_3d"],
            "image_path": r["image_path"],
            "action": r["action"],
        }
        for r in records
    ]


def _assert_same(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for k in ra:
            if isinstance(ra[k], np.ndarray):
                np.testing.assert_array_equal(ra[k], rb[k], err_msg=k)
            else:
                assert ra[k] == rb[k], k


@pytest.mark.skipif(not native.chunkio_available(),
                    reason="native chunkio not built")
def test_native_reader_matches_tarfile(chunk):
    tar_path, _ = chunk
    members = native.read_chunk_members(tar_path)
    assert members is not None
    with tarfile.open(tar_path, "r:*") as tar:
        expected = {
            m.name: tar.extractfile(m).read()
            for m in tar.getmembers() if m.isfile()
        }
    assert members == expected


@pytest.mark.skipif(not native.chunkio_available(),
                    reason="native chunkio not built")
def test_native_reader_pax_longname_and_plain_tar(tmp_path):
    # PAX extended headers (Python tarfile's default format) with a
    # >100-char member name, fractional mtimes, and a directory entry.
    longname = "chunk_000001/" + "d" * 120 + "/payload.bin"
    blobs = {
        "chunk_000001/samples.pkl": b"\x80\x04N.",
        "chunk_000001/data/000000/image.jpg": bytes(range(256)) * 37,
        longname: b"LONG" * 100,
    }
    for mode, suffix in [("w:gz", ".tar.gz"), ("w", ".tar")]:
        path = tmp_path / f"pax{suffix}"
        with tarfile.open(path, mode) as tar:
            d = tarfile.TarInfo("chunk_000001")
            d.type = tarfile.DIRTYPE
            tar.addfile(d)
            for name, data in blobs.items():
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                ti.mtime = 1234.5678  # forces a PAX mtime record
                tar.addfile(ti, io.BytesIO(data))
        members = native.read_chunk_members(path)
        assert members == blobs, suffix


@pytest.mark.skipif(not native.chunkio_available(),
                    reason="native chunkio not built")
def test_native_reader_randomized_parity(tmp_path):
    """Randomized archives (name lengths around the 100-byte ustar limit,
    zero-byte and odd-sized members, dirs and symlinks interleaved, both
    tar and tar.gz): the native reader must return exactly tarfile's view
    of the regular files."""
    import numpy as np

    rng = np.random.default_rng(42)
    for trial in range(6):
        gz = trial % 2 == 0
        path = tmp_path / f"fuzz{trial}.tar{'.gz' if gz else ''}"
        expected = {}
        with tarfile.open(path, "w:gz" if gz else "w") as tar:
            for j in range(int(rng.integers(1, 12))):
                kind = rng.integers(0, 10)
                name_len = int(rng.integers(1, 150))
                name = f"d{trial}/" + "n" * name_len + f"_{j}"
                if kind == 0:  # directory
                    d = tarfile.TarInfo(name)
                    d.type = tarfile.DIRTYPE
                    tar.addfile(d)
                elif kind == 1:  # symlink — no payload, must be skipped
                    s = tarfile.TarInfo(name)
                    s.type = tarfile.SYMTYPE
                    s.linkname = "elsewhere"
                    tar.addfile(s)
                else:
                    size = int(rng.integers(0, 10_000))
                    data = rng.integers(0, 256, size=size,
                                        dtype=np.uint8).tobytes()
                    ti = tarfile.TarInfo(name)
                    ti.size = size
                    ti.mtime = float(rng.uniform(0, 2e9))  # PAX records
                    tar.addfile(ti, io.BytesIO(data))
                    expected[name] = data
        got = native.read_chunk_members(path)
        assert got == expected, path


@pytest.mark.skipif(not native.chunkio_available(),
                    reason="native chunkio not built")
def test_native_reader_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.tar.gz"
    bad.write_bytes(b"this is not an archive")
    assert native.read_chunk_members(bad) is None  # caller falls back


def test_stream_store_decodes_identically(chunk, tmp_path):
    """extract path == native stream == Python-fallback stream."""
    tar_path, samples_gt = chunk
    cdir = extract_chunk(tar_path, tmp_path / "cache")
    ref_store = DirChunkStore(cdir)
    ref = decode_chunk_samples(ref_store.samples, ref_store, (32, 32))
    assert len(ref) == 5

    stream = open_chunk_store(tar_path, mode="stream")
    assert isinstance(stream, MemoryChunkStore)
    got = decode_chunk_samples(stream.samples, stream, (32, 32))
    _assert_same(_decoded_fields(ref), _decoded_fields(got))


def test_python_fallback_stream(chunk, monkeypatch):
    tar_path, _ = chunk
    monkeypatch.setattr(native, "read_chunk_members", lambda p: None)
    store = open_chunk_store(tar_path, mode="stream")
    assert isinstance(store, MemoryChunkStore)
    assert len(store.samples) == 5
    assert store.read_member(store.samples[0]["image_file"]) is not None
    assert store.read_member("does/not/exist") is None


def test_xz_archive_streams_via_fallback(tmp_path):
    # native chunkio only handles tar/tar.gz; .tar.xz must still stream
    # through the tarfile fallback inside open_chunk_store.
    tar_path, _ = make_synthetic_chunk(
        tmp_path, 7, num_samples=2, image_hw=(24, 30), prefix="train",
        compression="xz",
    )
    store = open_chunk_store(tar_path, mode="stream")
    assert isinstance(store, MemoryChunkStore)
    out = decode_chunk_samples(store.samples, store, (16, 16))
    assert len(out) == 2 and out[0]["image"].shape == (16, 16, 3)


def test_stream_mode_touches_no_disk(chunk, tmp_path):
    tar_path, _ = chunk
    cache = tmp_path / "cache_untouched"
    cache.mkdir()
    store = open_chunk_store(tar_path, cache, mode="stream")
    assert isinstance(store, MemoryChunkStore)
    assert list(cache.iterdir()) == []


def test_auto_mode_reuses_extracted_cache(chunk, tmp_path):
    tar_path, _ = chunk
    cache = tmp_path / "cache_auto"
    extract_chunk(tar_path, cache)
    store = open_chunk_store(tar_path, cache, mode="auto")
    assert isinstance(store, DirChunkStore)  # warm cache wins
    # cold cache → stream
    cold = open_chunk_store(tar_path, tmp_path / "cold", mode="auto")
    assert isinstance(cold, MemoryChunkStore)


def test_open_chunk_store_invalid_modes(chunk, tmp_path):
    tar_path, _ = chunk
    with pytest.raises(ValueError, match="chunk_io"):
        open_chunk_store(tar_path, mode="bogus")
    with pytest.raises(ValueError, match="cache_dir"):
        open_chunk_store(tar_path, mode="extract")  # extract needs a cache
    # stream-mode failure with a cache_dir available falls back to extract
    bad = tmp_path / "dataset_chunk_000009.tar.gz"
    bad.write_bytes(b"\x1f\x8bgarbage")
    with pytest.raises(Exception):
        open_chunk_store(bad, mode="stream")  # no fallback without cache


def test_missing_samples_pkl_raises(tmp_path):
    path = tmp_path / "empty.tar.gz"
    with tarfile.open(path, "w:gz") as tar:
        ti = tarfile.TarInfo("chunk_000000/data/000000/image.jpg")
        ti.size = 4
        tar.addfile(ti, io.BytesIO(b"xxxx"))
    with pytest.raises(FileNotFoundError):
        open_chunk_store(path, mode="stream")


def test_pipeline_skips_corrupt_archive(tmp_path):
    """A corrupt archive in the dataset dir must be logged and skipped by
    the streaming prefetcher — the remaining chunks still stream (the
    reference's per-sample skip-on-error ethos at chunk granularity,
    chunked_dataset.py:234-244)."""
    from pose3d_tpu.data import StreamingChunkedDataset

    root = tmp_path / "ds"
    make_synthetic_chunk(root, 0, num_samples=4, image_hw=(40, 50),
                         prefix="train")
    make_synthetic_chunk(root, 2, num_samples=4, image_hw=(40, 50),
                         prefix="train")
    (root / "train" / "dataset_chunk_000001.tar.gz").write_bytes(
        b"\x1f\x8bnot really gzip data"
    )
    ds = StreamingChunkedDataset(
        "train", root, image_size=(32, 32), cache_dir=tmp_path / "c",
        shuffle=False, shuffle_chunks=False, chunk_io="stream",
    )
    assert len(list(ds)) == 8  # chunks 0 and 2 survive


def test_pipeline_stream_equals_extract(tmp_path):
    from pose3d_tpu.data import StreamingChunkedDataset

    root = tmp_path / "ds"
    make_synthetic_chunk(root, 0, num_samples=6, image_hw=(40, 50),
                         prefix="train")

    def collect(chunk_io, cache):
        ds = StreamingChunkedDataset(
            "train", root, image_size=(32, 32), cache_dir=cache,
            shuffle=False, shuffle_chunks=False, chunk_io=chunk_io,
        )
        return list(ds)

    a = collect("extract", tmp_path / "c1")
    b = collect("stream", tmp_path / "c2")
    _assert_same(_decoded_fields(a), _decoded_fields(b))
    assert list((tmp_path / "c2").rglob("samples.pkl")) == []  # no extraction
