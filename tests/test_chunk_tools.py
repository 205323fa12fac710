"""End-to-end tests of the dataset-engineering tools over a synthetic
Human3.6M-style raw layout: chunker → shuffler → splitter → streaming loader."""

import json
import tarfile
from pathlib import Path

import cv2
import numpy as np
import pytest

from pose3d_tpu.data.chunker import Human36MChunker
from pose3d_tpu.data.rechunk import DatasetShuffler, DatasetSplitter, validate_sample
from pose3d_tpu.data.chunks import extract_chunk, load_chunk_samples
from pose3d_tpu.data import StreamingChunkedDataset

rng = np.random.default_rng(0)


def _make_raw_h36m(root: Path, subjects=(1, 5), frames_per_subject=6):
    """Synthetic raw layout: annotations + images + preprocess artifacts."""
    ann = root / "annotations"
    imgs = root / "images"
    proc = root / "processed"
    for subject in subjects:
        images, annotations = [], []
        joints = {}
        for i in range(frames_per_subject):
            folder = f"s_{subject:02d}_act_02"
            fname = f"{folder}/frame_{i:06d}.jpg"
            (imgs / folder).mkdir(parents=True, exist_ok=True)
            (proc / folder).mkdir(parents=True, exist_ok=True)
            img = rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
            cv2.imwrite(str(imgs / fname), img)
            depth = rng.integers(0, 255, size=(40, 50), dtype=np.uint8)
            cv2.imwrite(str(proc / folder / f"frame_{i:06d}_depth.png"), depth)
            kpts = rng.uniform(2, [48, 38], size=(17, 2))
            meta = {
                "image_size": [50, 40],
                "keypoints": [[{"x": float(x), "y": float(y)}
                               for x, y in kpts]],
                "depth_min": 1.0, "depth_max": 9.0,
            }
            with open(proc / folder / f"frame_{i:06d}.json", "w") as f:
                json.dump(meta, f)
            img_id = subject * 1000 + i
            images.append({
                "id": img_id, "file_name": fname,
                "action_idx": 2, "subaction_idx": 1, "frame_idx": i,
                "cam_idx": 1, "subject": subject,
                "width": 50, "height": 40,
            })
            annotations.append({
                "image_id": img_id, "bbox": [0, 0, 50, 40],
            })
            joints.setdefault("2", {}).setdefault("1", {})[str(i)] = (
                rng.normal(size=(17, 3)) * 500 + [0, 0, 5000]
            ).tolist()
        ann.mkdir(parents=True, exist_ok=True)
        with open(ann / f"Human36M_subject{subject}_data.json", "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
        with open(ann / f"Human36M_subject{subject}_camera.json", "w") as f:
            json.dump({"1": {"R": np.eye(3).tolist(), "t": [0, 0, 0],
                             "f": [1000, 1000], "c": [25, 20]}}, f)
        with open(ann / f"Human36M_subject{subject}_joint_3d.json", "w") as f:
            json.dump(joints, f)
    return root


@pytest.fixture(scope="module")
def raw_and_chunks(tmp_path_factory):
    root = tmp_path_factory.mktemp("h36m_raw")
    _make_raw_h36m(root)
    out = tmp_path_factory.mktemp("chunker_out")
    chunker = Human36MChunker(
        subject_ids=[1, 5],
        output_dir=out,
        annotations_path=root / "annotations",
        images_path=root / "images",
        processed_path=root / "processed",
        chunk_size=5,
        compression="gz",
    )
    chunker.process()
    return root, out


def test_chunker_creates_chunks(raw_and_chunks):
    _, out = raw_and_chunks
    tars = sorted(out.glob("human36m_chunk_*.tar.gz"))
    # 12 samples / 5 per chunk = 3 chunks, six-digit indices
    assert len(tars) == 3
    assert tars[0].name == "human36m_chunk_000000.tar.gz"
    state = json.loads((out / "chunker_state.json").read_text())
    assert sorted(state["subjects_processed"]) == [1, 5]
    assert len(state["chunks_uploaded"]) == 3


def test_chunker_chunk_contents(raw_and_chunks, tmp_path):
    _, out = raw_and_chunks
    tar0 = sorted(out.glob("*.tar.gz"))[0]
    cdir = extract_chunk(tar0, tmp_path)
    samples = load_chunk_samples(cdir)
    assert len(samples) == 5
    s = samples[0]
    # chunk-relative paths exist
    assert (cdir / s["image_file"]).exists()
    assert (cdir / s["depth_file"]).exists()
    assert (cdir / s["metadata_file"]).exists()
    # camera-space joints with z around 5000 (world→camera with R=I, t=0)
    j = np.asarray(s["joints_3d"])
    assert j.shape == (17, 3)
    assert 4000 < j[:, 2].mean() < 6000
    # metadata merged into the sample dict
    assert s["depth_min"] == 1.0 and s["depth_max"] == 9.0
    assert s["subject"] in (1, 5)
    assert validate_sample(s, cdir) is None


def test_chunker_resume_noop(raw_and_chunks):
    """Re-running with resume=True must not duplicate chunks."""
    root, out = raw_and_chunks
    before = sorted(out.glob("*.tar.gz"))
    chunker = Human36MChunker(
        subject_ids=[1, 5], output_dir=out,
        annotations_path=root / "annotations",
        images_path=root / "images",
        processed_path=root / "processed",
        chunk_size=5, resume=True,
    )
    chunker.process()
    after = sorted(out.glob("*.tar.gz"))
    assert before == after


def test_shuffler_roundtrip(raw_and_chunks, tmp_path):
    _, out = raw_and_chunks
    shuf_out = tmp_path / "shuffled"
    n = DatasetShuffler(
        input_dir=out, output_dir=shuf_out, chunk_size=4,
        num_workers=2, seed=7,
    ).run()
    assert n == 12
    tars = sorted(shuf_out.glob("shuffled_dataset_chunk_*.tar.gz"))
    assert len(tars) == 3  # 12/4
    # all samples still valid after repack
    cdir = extract_chunk(tars[0], tmp_path / "x")
    for s in load_chunk_samples(cdir):
        assert validate_sample(s, cdir) is None


def test_splitter_routes_by_subject(raw_and_chunks, tmp_path):
    _, out = raw_and_chunks
    split_out = tmp_path / "split"
    counters = DatasetSplitter(
        input_dir=out, output_dir=split_out,
        train_subjects=[1], test_subjects=[5],
        staging_dir=tmp_path / "staging", new_chunk_size=4,
    ).run()
    assert counters == {"train": 2, "test": 2}  # 6 samples each / 4
    # verify routing: every sample in train/ has subject 1
    t0 = sorted((split_out / "train").glob("*.tar.gz"))[0]
    cdir = extract_chunk(t0, tmp_path / "t")
    for s in load_chunk_samples(cdir):
        assert s["subject"] == 1


def test_split_output_feeds_streaming_loader(raw_and_chunks, tmp_path):
    """The splitter's output must stream through the training input
    pipeline (the reference's train consumption contract)."""
    _, out = raw_and_chunks
    split_out = tmp_path / "split2"
    DatasetSplitter(
        input_dir=out, output_dir=split_out,
        train_subjects=[1], test_subjects=[5],
        staging_dir=tmp_path / "st2", new_chunk_size=100,
    ).run()
    ds = StreamingChunkedDataset(
        "train", str(split_out), image_size=(32, 32),
        cache_dir=tmp_path / "cache", decode_workers=2,
    )
    samples = list(ds)
    assert len(samples) == 6
    for s in samples:
        assert s["image"].shape == (32, 32, 3)
        assert np.allclose(s["joints_3d"][0], 0)  # root-centered


def test_splitter_resume_skips_done(raw_and_chunks, tmp_path):
    _, out = raw_and_chunks
    split_out = tmp_path / "split3"
    staging = tmp_path / "st3"
    sp = DatasetSplitter(
        input_dir=out, output_dir=split_out,
        train_subjects=[1], test_subjects=[5],
        staging_dir=staging, new_chunk_size=4,
    )
    c1 = sp.run()
    sp2 = DatasetSplitter(
        input_dir=out, output_dir=split_out,
        train_subjects=[1], test_subjects=[5],
        staging_dir=staging, new_chunk_size=4, resume=True,
    )
    c2 = sp2.run()
    assert c2 == c1  # nothing re-processed, counters unchanged


def test_chunker_dereferences_symlinked_sources(raw_and_chunks, tmp_path):
    """Datasets linked into place (symlinked image trees) must be stored
    as file CONTENT in the archives — a SYMTYPE member has no payload and
    every chunk reader would silently drop the sample (review finding on
    the streaming tar.add path)."""
    from pose3d_tpu.data.chunks import decode_chunk_samples, open_chunk_store

    root, _ = raw_and_chunks
    link_root = tmp_path / "linked"
    for sub in ("images", "processed", "annotations"):
        for f in (root / sub).rglob("*"):
            if f.is_file():
                dst = link_root / sub / f.relative_to(root / sub)
                dst.parent.mkdir(parents=True, exist_ok=True)
                dst.symlink_to(f)
    out2 = tmp_path / "chunks_sym"
    Human36MChunker(
        subject_ids=[1], output_dir=out2,
        annotations_path=link_root / "annotations",
        images_path=link_root / "images",
        processed_path=link_root / "processed",
        chunk_size=6, compression="gz",
    ).process()
    tar0 = sorted(out2.glob("*.tar.gz"))[0]
    with tarfile.open(tar0, "r:*") as tar:
        assert all(m.isfile() for m in tar.getmembers()), "symlink stored"
    store = open_chunk_store(tar0, mode="stream")
    decoded = decode_chunk_samples(store.samples, store, (24, 24))
    assert len(decoded) == 6
    assert decoded[0]["image"].shape == (24, 24, 3)


def test_splitter_crash_resume_exact(raw_and_chunks, tmp_path):
    """Kill the splitter mid-flush (pending samples routed but unflushed,
    an output archive half-written) and resume: the deterministic-replay
    resume must reproduce BIT-IDENTICAL sample routing to a never-crashed
    control run (round-3 streaming splitter; stronger than the
    reference's pending-pickle caches, dataset_split.py:158-203)."""
    from pose3d_tpu.data import rechunk
    from pose3d_tpu.data.chunks import open_chunk_store

    _, out = raw_and_chunks

    def collect(split_out):
        got = {}
        for split in ("train", "test"):
            for tar in sorted((split_out / split).glob("*.tar.*")):
                store = open_chunk_store(tar, mode="stream")
                got[f"{split}/{tar.name}"] = [
                    (s["subject"], s["frame_idx"],
                     store.read_member(s["image_file"]))
                    for s in store.samples
                ]
        return got

    kw = dict(input_dir=out, train_subjects=[1], test_subjects=[5],
              new_chunk_size=4)
    ctrl_out = tmp_path / "ctrl"
    DatasetSplitter(output_dir=ctrl_out, staging_dir=tmp_path / "ctrl_st",
                    **kw).run()

    crash_out = tmp_path / "crash"
    staging = tmp_path / "crash_st"
    orig_pack, calls = rechunk._pack_chunk, {"n": 0}

    def flaky_pack(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-flush")
        return orig_pack(*a, **k)

    rechunk._pack_chunk = flaky_pack
    try:
        with pytest.raises(RuntimeError):
            DatasetSplitter(output_dir=crash_out, staging_dir=staging,
                            **kw).run()
    finally:
        rechunk._pack_chunk = orig_pack

    counters = DatasetSplitter(output_dir=crash_out, staging_dir=staging,
                               resume=True, **kw).run()
    assert counters == {"train": 2, "test": 2}
    assert collect(crash_out) == collect(ctrl_out)


def test_pack_chunk_writes_samples_pkl_first(raw_and_chunks, tmp_path):
    """Archives written by the chunker AND the repackers lead with
    samples.pkl so streaming readers (count_chunk_samples during resume
    fast-forward) stop after one member instead of inflating the whole
    archive."""
    from pose3d_tpu.data.chunks import count_chunk_samples

    _, out = raw_and_chunks
    shuf_out = tmp_path / "shuf_first"
    DatasetShuffler(input_dir=out, output_dir=shuf_out, chunk_size=4,
                    num_workers=2, seed=7).run()
    for tar0, n in [
        (sorted(shuf_out.glob("*.tar.gz"))[0], 4),      # repacker
        (sorted(out.glob("*.tar.gz"))[0], 5),           # chunker
    ]:
        with tarfile.open(tar0, "r:*") as tar:
            first = next(iter(tar))
            assert first.name.endswith("samples.pkl"), tar0
        assert count_chunk_samples(tar0) == n


def test_extract_recovers_from_stale_partial_dir(raw_and_chunks, tmp_path):
    """A partial chunk dir without samples.pkl (killed run of the old
    in-place extractor) must be replaced, not poison the cache forever
    (review finding)."""
    from pose3d_tpu.data.chunks import extract_chunk, chunk_id_from_filename

    _, chunks_dir = raw_and_chunks
    tar = sorted(chunks_dir.glob("human36m_chunk_*.tar.gz"))[0]
    cache = tmp_path / "stale_cache"
    cid = chunk_id_from_filename(tar)
    stale = cache / f"chunk_{cid:06d}" / "data" / "000000"
    stale.mkdir(parents=True)
    (stale / "junk.bin").write_bytes(b"partial")

    out = extract_chunk(tar, cache)
    assert (out / "samples.pkl").exists()
    assert not (out / "data" / "000000" / "junk.bin").exists() or (
        out / "samples.pkl").exists()
    # second call is a cheap cache hit
    assert extract_chunk(tar, cache) == out


def test_chunker_pause_resume_loses_no_samples(raw_and_chunks, tmp_path):
    """Pause (SIGINT-style SystemExit) during chunk creation, then
    resume: every loaded sample must end up in exactly one uploaded
    chunk. The old state machine committed sample ids at LOAD time, so
    loaded-but-unpacked samples were silently dropped forever on resume
    (review finding)."""
    root, _ = raw_and_chunks
    out = tmp_path / "pause_chunks"

    def build(**kw):
        return Human36MChunker(
            subject_ids=[1, 5], output_dir=out,
            annotations_path=root / "annotations",
            images_path=root / "images",
            processed_path=root / "processed",
            chunk_size=5, compression="gz", **kw,
        )

    ck = build()
    uploads = {"n": 0}
    orig_upload = ck._upload_chunk

    def pausing_upload(archive, name, ids=()):
        orig_upload(archive, name, ids)
        uploads["n"] += 1
        if uploads["n"] == 1:  # pause right after the first chunk lands
            ck._pause_requested = True

    ck._upload_chunk = pausing_upload
    with pytest.raises(SystemExit):
        ck.process()
    assert len(list(out.glob("*.tar.gz"))) == 1  # paused mid-run

    build(resume=True).process()  # same command line, resumed

    from pose3d_tpu.data.chunks import open_chunk_store

    seen = []
    for tar in sorted(out.glob("*.tar.gz")):
        store = open_chunk_store(tar, mode="stream")
        seen.extend(
            (s["subject"], s["frame_idx"], s["cam_idx"]) for s in store.samples
        )
    assert len(seen) == 12 and len(set(seen)) == 12  # no loss, no dupes
