"""Input-pipeline tests over synthetic chunks in the reference's container
format (no Human3.6M needed)."""

import io

import numpy as np
import pytest

from pose3d_tpu.data import (
    StreamingChunkedDataset,
    BatchLoader,
    list_chunk_files,
    extract_chunk,
    load_chunk_samples,
    decode_sample,
)
from pose3d_tpu.data.collate import collate_fixed, device_batch

from helpers_synthetic import make_synthetic_chunk, make_synthetic_dataset


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("chunks")
    paths, samples = make_synthetic_dataset(
        root, num_chunks=2, num_samples=6, image_hw=(40, 50), prefix="train"
    )
    return root, paths, samples


def test_list_chunk_files_index_filter(chunk_dir):
    root, paths, _ = chunk_dir
    allf = list_chunk_files(root, "train")
    assert len(allf) == 2
    only0 = list_chunk_files(root, "train", chunk_indices=[0])
    assert len(only0) == 1 and "000000" in only0[0].name


def test_extract_and_decode(chunk_dir, tmp_path):
    root, paths, samples = chunk_dir
    cdir = extract_chunk(paths[0], tmp_path)
    assert (cdir / "samples.pkl").exists()
    loaded = load_chunk_samples(cdir)
    assert len(loaded) == 6

    out = decode_sample(loaded[0], cdir, image_size=(32, 32))
    assert out is not None
    assert out["image"].shape == (32, 32, 3)
    assert out["depth"].shape == (32, 32, 1)
    assert out["keypoints_2d"].shape == (17, 2)
    assert out["joints_3d"].shape == (17, 3)
    # root-centered
    np.testing.assert_allclose(out["joints_3d"][0], 0.0, atol=1e-6)
    # original joints were root-centered the same way
    j = np.asarray(loaded[0]["joints_3d"])
    np.testing.assert_allclose(out["joints_3d"], j - j[0:1], rtol=1e-4, atol=1e-2)
    # keypoints normalized to (0,1) by original size
    assert np.all(out["keypoints_2d"] > 0) and np.all(out["keypoints_2d"] < 1)
    # depth rescaled into [depth_min, depth_max]
    assert out["depth"].min() >= 1.5 - 1e-5
    assert out["depth"].max() <= 7.5 + 1e-5
    assert out["image"].min() >= 0 and out["image"].max() <= 1


def test_decode_missing_file_returns_none(chunk_dir, tmp_path):
    root, paths, _ = chunk_dir
    cdir = extract_chunk(paths[0], tmp_path / "c2")
    bad = dict(load_chunk_samples(cdir)[0])
    bad["image_file"] = "data/does/not/exist.jpg"
    assert decode_sample(bad, cdir) is None


def test_streaming_dataset_yields_all(chunk_dir, tmp_path):
    root, _, samples = chunk_dir
    ds = StreamingChunkedDataset(
        "train", str(root), image_size=(32, 32), cache_dir=tmp_path,
        shuffle=True, shuffle_chunks=True, decode_workers=2,
    )
    got = list(ds)
    assert len(got) == len(samples) == 12
    for s in got:
        assert s["image"].shape == (32, 32, 3)


def test_streaming_dataset_sharding(chunk_dir, tmp_path):
    root, _, _ = chunk_dir
    counts = []
    for shard in range(2):
        ds = StreamingChunkedDataset(
            "train", str(root), image_size=(32, 32),
            cache_dir=tmp_path / f"s{shard}",
            shard_id=shard, num_shards=2, shuffle_chunks=False,
            decode_workers=2,
        )
        counts.append(len(list(ds)))
    assert sum(counts) == 12
    assert counts == [6, 6]  # one chunk each


def test_batch_loader_fixed_shapes(chunk_dir, tmp_path):
    root, _, _ = chunk_dir
    ds = StreamingChunkedDataset(
        "train", str(root), image_size=(32, 32), cache_dir=tmp_path / "bl",
        decode_workers=2,
    )
    batches = list(BatchLoader(ds, batch_size=4, drop_last=True))
    assert len(batches) == 3  # 12 samples / 4
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["depth"].shape == (4, 32, 32, 1)
        assert b["keypoints_2d"].shape == (4, 17, 2)
        assert b["joints_3d"].shape == (4, 17, 3)
        db = device_batch(b)
        assert set(db.keys()) == {"image", "depth", "keypoints_2d", "joints_3d"}


def test_collate_pads_and_crops():
    mk = lambda h, w: {  # noqa: E731
        "image": np.ones((h, w, 3), np.float32),
        "depth": np.ones((h, w, 1), np.float32),
        "keypoints_2d": np.zeros((17, 2), np.float32),
        "joints_3d": np.zeros((17, 3), np.float32),
        "image_size": np.array([w, h], np.float32),
    }
    out = collate_fixed([mk(8, 8), mk(6, 4), mk(12, 10)], image_size=(8, 8))
    assert out["image"].shape == (3, 8, 8, 3)
    # sample 1 was padded bottom/right with zeros
    assert out["image"][1, :6, :4].min() == 1.0
    assert out["image"][1, 6:, :].max() == 0.0
    assert out["image"][1, :, 4:].max() == 0.0
    # sample 2 was cropped
    assert out["image"][2].min() == 1.0


def test_dataset_len_estimate(chunk_dir, tmp_path):
    root, _, _ = chunk_dir
    ds = StreamingChunkedDataset(
        "train", str(root), image_size=(32, 32), cache_dir=tmp_path / "le",
    )
    assert len(ds) == 2000  # 1000 × num_chunks (reference convention)


def test_batchloader_propagates_feeder_errors():
    """A data-pipeline exception must surface in the consumer — the old
    feeder swallowed it via return-inside-finally and training saw a
    clean truncated epoch (review finding)."""
    class ExplodingDataset:
        image_size = (8, 8)

        def __iter__(self):
            rng = np.random.default_rng(0)
            for i in range(3):
                yield {
                    "image": rng.random((8, 8, 3), np.float32),
                    "depth": rng.random((8, 8, 1), np.float32),
                    "keypoints_2d": rng.random((17, 2)).astype(np.float32),
                    "joints_3d": rng.random((17, 3)).astype(np.float32),
                    "image_size": np.array([8.0, 8.0], np.float32),
                }
            raise OSError("disk vanished mid-epoch")

    loader = BatchLoader(ExplodingDataset(), batch_size=2)
    it = iter(loader)
    next(it)  # first full batch works
    with pytest.raises(RuntimeError, match="data pipeline failed"):
        for _ in it:
            pass


def test_raw_positions_count_dropped_samples(tmp_path):
    """_pos counts RAW stream samples (the units skip_next_samples
    consumes): a sample dropped by a decode error must still advance the
    position, or every resume after it replays trained samples
    (review finding)."""
    import tarfile

    from helpers_synthetic import make_synthetic_chunk

    root = tmp_path / "ds"
    tar_path, _ = make_synthetic_chunk(
        root, 0, num_samples=6, image_hw=(40, 50), prefix="train"
    )
    # corrupt sample 2's image INSIDE the archive
    tmp_tar = tar_path.with_suffix(".new")
    with tarfile.open(tar_path, "r:gz") as src, \
            tarfile.open(tmp_tar, "w:gz") as dst:
        for m in src:
            data = src.extractfile(m).read() if m.isfile() else None
            if m.name.endswith("000002/image.jpg"):
                data = b"corrupt!"
                m.size = len(data)
            dst.addfile(m, io.BytesIO(data) if data is not None else None)
    tmp_tar.replace(tar_path)

    ds = StreamingChunkedDataset(
        "train", root, image_size=(32, 32), cache_dir=tmp_path / "c",
        shuffle=False, shuffle_chunks=False,
    )
    loader = BatchLoader(ds, batch_size=1, drop_last=False)
    batches = list(loader)
    assert len(batches) == 5  # sample 2 dropped
    positions = [b["_pos"][1] for b in batches]
    # raw positions skip over the dropped sample: 1,2,4,5,6 not 1..5
    assert positions == [1, 2, 4, 5, 6]

    # resuming from the position recorded after the 2nd batch must
    # reproduce exactly the uninterrupted run's remaining stream
    ds2 = StreamingChunkedDataset(
        "train", root, image_size=(32, 32), cache_dir=tmp_path / "c2",
        shuffle=False, shuffle_chunks=False,
    )
    ds2.set_epoch(0)
    ds2.skip_next_samples(positions[1])
    tail = [s["_raw_pos"] for s in ds2]
    assert tail == [4, 5, 6]
