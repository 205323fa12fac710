"""Concurrency property tests for the host pipeline (SURVEY.md §5: the
reference relies on hand-managed locks/queues with no tests; here the
prefetcher/loader must deliver every sample exactly once under churn)."""

import threading

import numpy as np

from pose3d_tpu.data import BatchLoader, StreamingChunkedDataset
from helpers_synthetic import make_synthetic_dataset


def test_no_loss_no_duplication(tmp_path):
    root = tmp_path / "chunks"
    make_synthetic_dataset(root, num_chunks=5, num_samples=7,
                           image_hw=(24, 24), prefix="train")
    ds = StreamingChunkedDataset(
        "train", str(root), image_size=(16, 16), cache_dir=tmp_path / "c",
        max_chunks_in_memory=1, decode_workers=2, shuffle=True,
    )
    # identity by content: joints are i.i.d. per sample, so the rounded
    # tuple is unique; every sample must appear exactly once
    seen = [tuple(np.round(s["joints_3d"][1], 3)) for s in ds]
    assert len(seen) == 35
    assert len(set(seen)) == 35


def test_two_concurrent_iterations(tmp_path):
    """Two loaders over the same chunks (shared cache dir) running in
    parallel threads must each see the full dataset."""
    root = tmp_path / "chunks"
    make_synthetic_dataset(root, num_chunks=3, num_samples=6,
                           image_hw=(24, 24), prefix="train")
    counts = {}

    def run(tag):
        ds = StreamingChunkedDataset(
            "train", str(root), image_size=(16, 16),
            cache_dir=tmp_path / "shared", decode_workers=2,
        )
        counts[tag] = len(list(ds))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert counts == {0: 18, 1: 18}


def test_batch_loader_early_stop_cleans_up(tmp_path):
    """Breaking out of a BatchLoader iteration must not deadlock or leak
    the feeder thread."""
    root = tmp_path / "chunks"
    make_synthetic_dataset(root, num_chunks=2, num_samples=8,
                           image_hw=(24, 24), prefix="train")
    ds = StreamingChunkedDataset(
        "train", str(root), image_size=(16, 16), cache_dir=tmp_path / "c2",
        decode_workers=2,
    )
    loader = BatchLoader(ds, batch_size=2, loop=True)  # infinite
    n_before = threading.active_count()
    it = iter(loader)
    for _ in range(3):
        next(it)
    del it  # generator close -> stop event
    import gc

    gc.collect()
    import time

    time.sleep(2)
    assert threading.active_count() <= n_before + 2  # feeder died/dying


def test_multiple_epochs_reshuffle(tmp_path):
    root = tmp_path / "chunks"
    make_synthetic_dataset(root, num_chunks=2, num_samples=6,
                           image_hw=(24, 24), prefix="train")
    ds = StreamingChunkedDataset(
        "train", str(root), image_size=(16, 16), cache_dir=tmp_path / "c3",
        decode_workers=2, shuffle=True, shuffle_chunks=True, seed=0,
    )
    e1 = [s["image_path"] for s in ds]
    e2 = [s["image_path"] for s in ds]
    assert sorted(e1) == sorted(e2)  # same multiset
    assert e1 != e2  # different order across epochs (seed + epoch)
