"""Deterministic mid-epoch data resume, graceful-stop (preemption), and
checkpoint retention / best-model tracking.

The reference restarts its data stream from scratch on every resume (its
checkpoints carry only step/model/optimizer, src/train.py:300-309); this
framework records the data-stream position {epoch, samples_consumed} in
meta.json and fast-forwards the seeded stream to the exact next sample —
whole skipped chunks are neither extracted nor decoded
(data/chunks.count_chunk_samples + the prefetcher RNG-advance trick).
"""

import json
import threading

import jax
import numpy as np
import pytest

from helpers_synthetic import make_synthetic_dataset
from pose3d_tpu.core.config import CNNModelConfig
from pose3d_tpu.data import BatchLoader, StreamingChunkedDataset
from pose3d_tpu.models import init_model
from pose3d_tpu.train import create_train_state, save_checkpoint
from pose3d_tpu.train.checkpoint import (
    apply_retention,
    best_checkpoint_path,
    load_checkpoint_meta,
    record_best,
    restore_train_state,
)
from pose3d_tpu.train.loop import train_model

TINY = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),
)


def _ids(samples):
    """Order-sensitive identity of a decoded sample stream."""
    return np.stack([np.asarray(s["keypoints_2d"]) for s in samples])


def _make_ds(root, cache, **kw):
    return StreamingChunkedDataset(
        "train", str(root), image_size=(32, 32), cache_dir=cache,
        decode_workers=2, **kw,
    )


@pytest.fixture(scope="module")
def chunks(tmp_path_factory):
    root = tmp_path_factory.mktemp("chunks")
    make_synthetic_dataset(root, num_chunks=3, num_samples=8,
                           image_hw=(32, 32), prefix="train")
    return root


@pytest.mark.parametrize("skip", [3, 8, 13])
def test_skip_matches_stream_tail(chunks, tmp_path, skip):
    """set_epoch + skip_next_samples(k) reproduces exactly the original
    epoch's stream from sample k (shuffled chunk order AND within-chunk
    shuffles both realign, including the shared RNG advanced over fully
    skipped chunks)."""
    full = _ids(list(_make_ds(chunks, tmp_path / "c1")))  # epoch 0

    ds = _make_ds(chunks, tmp_path / "c2")
    ds.set_epoch(0)
    ds.skip_next_samples(skip)
    tail = _ids(list(ds))
    np.testing.assert_array_equal(tail, full[skip:])

    # the skip is one-shot: the next epoch starts clean (epoch 1 ordering)
    ds_ref = _make_ds(chunks, tmp_path / "c4")
    ds_ref.set_epoch(1)
    epoch1 = _ids(list(ds_ref))
    np.testing.assert_array_equal(_ids(list(ds)), epoch1)  # ds is at epoch 1


def test_skipped_chunks_not_extracted(chunks, tmp_path):
    """A fully skipped chunk must never be extracted or decoded — only its
    samples.pkl is read (streamed from the tar). Run with
    chunk_io="extract" so extraction itself is the observable (the
    default "auto" mode streams and extracts nothing at all)."""
    cache = tmp_path / "cache"
    ds = _make_ds(chunks, cache, shuffle=False, shuffle_chunks=False,
                  chunk_io="extract")
    ds.skip_next_samples(8)  # exactly the first chunk
    out = _ids(list(ds))
    assert out.shape[0] == 16  # chunks 1 and 2
    shard = cache / "train" / "shard_0"
    assert not (shard / "chunk_000000").exists()
    assert (shard / "chunk_000001" / "samples.pkl").exists()
    assert (shard / "chunk_000002" / "samples.pkl").exists()

    # and in the default streaming mode the cache stays empty entirely
    cache2 = tmp_path / "cache_stream"
    ds2 = _make_ds(chunks, cache2, shuffle=False, shuffle_chunks=False)
    ds2.skip_next_samples(8)
    assert _ids(list(ds2)).shape[0] == 16
    assert list((cache2 / "train" / "shard_0").rglob("samples.pkl")) == []


def test_count_chunk_samples(chunks, tmp_path):
    from pose3d_tpu.data.chunks import (
        count_chunk_samples,
        extract_chunk,
        list_chunk_files,
    )

    files = list_chunk_files(chunks, "train")
    assert count_chunk_samples(files[0]) == 8  # streamed from the tar
    cache = tmp_path / "cc"
    extract_chunk(files[0], cache)
    assert count_chunk_samples(files[0], cache) == 8  # cached samples.pkl


def test_batch_positions_cumulative_after_resume(chunks, tmp_path):
    """Positions reported after a fast-forward include the skipped base, so
    a checkpoint taken after a resume records epoch-absolute positions."""
    ds = _make_ds(chunks, tmp_path / "c")
    ds.set_epoch(0)
    ds.skip_next_samples(6)
    loader = BatchLoader(ds, batch_size=2)
    positions = [b["_pos"] for b in loader]
    assert positions[0] == (0, 8)  # 6 skipped + first batch of 2
    assert positions[-1] == (0, 24)


@pytest.mark.slow
def test_train_resume_bitwise_equivalence(tmp_path):
    """Interrupt-and-resume must reproduce the uninterrupted run exactly:
    restore checkpoint at step 3 (data position in meta.json), fast-forward
    the stream, train to step 8 → params identical to the continuous run.

    18 train samples/epoch at 4 samples/step makes step 5 a superbatch that
    STRADDLES the epoch-0→1 boundary under BatchLoader(loop=True) — the
    position bookkeeping must attribute it to epoch 1 ({1, 2})."""
    root = tmp_path / "chunks18"
    make_synthetic_dataset(root, num_chunks=3, num_samples=6,
                           image_hw=(32, 32), prefix="train")

    def loaders(tag):
        ds = _make_ds(root, tmp_path / f"cache_{tag}")
        ds.training = True
        return BatchLoader(ds, batch_size=2, loop=True)

    model, variables = init_model(TINY, batch_size=2)

    # continuous run: 8 steps, checkpoints at 3, 6 and (finally-path) 8
    state = create_train_state(model, variables)
    prefix = str(tmp_path / "cont")
    state_cont, last = train_model(
        state, "cnn", loaders("cont"), None,
        model=model, model_args=TINY.to_dict(),
        gradient_accumulation_steps=2, num_steps=8,
        eval_interval_steps=3, preview_interval_steps=1000,
        checkpoint_prefix=prefix,
    )
    assert last == 8

    meta = load_checkpoint_meta(f"{prefix}_cnn_step_3")
    ds_meta = meta["data_state"]
    assert ds_meta == {"epoch": 0, "samples_consumed": 12}

    # resumed run: restore step-3 checkpoint, fast-forward the data stream
    model2, variables2 = init_model(TINY, batch_size=2)
    fresh = create_train_state(model2, variables2)
    restored, _ = restore_train_state(fresh, f"{prefix}_cnn_step_3")
    loader = loaders("res")
    loader.dataset.set_epoch(ds_meta["epoch"])
    loader.dataset.skip_next_samples(ds_meta["samples_consumed"])
    state_res, last2 = train_model(
        restored, "cnn", loader, None,
        model=model2, model_args=TINY.to_dict(),
        gradient_accumulation_steps=2, num_steps=8, start_step=3,
        eval_interval_steps=1000, preview_interval_steps=1000,
        checkpoint_prefix=str(tmp_path / "res"),
        data_state=ds_meta,
    )
    assert last2 == 8

    for a, b in zip(
        jax.tree_util.tree_leaves(state_cont.params),
        jax.tree_util.tree_leaves(state_res.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the resumed run's own (finally-path) checkpoint records the
    # epoch-absolute position: 8 steps x 4 = 32 samples = 18 (epoch 0)
    # + 14 into epoch 1
    meta8 = load_checkpoint_meta(str(tmp_path / "res") + "_cnn_step_8")
    assert meta8["data_state"] == {"epoch": 1, "samples_consumed": 14}
    # so does the continuous run's
    meta8c = load_checkpoint_meta(f"{prefix}_cnn_step_8")
    assert meta8c["data_state"] == {"epoch": 1, "samples_consumed": 14}


def test_stop_event_graceful(tmp_path):
    """A set stop_event ends training after the in-flight step and the
    finally-path checkpoint carries the data position (the SIGTERM
    preemption path, wired in cli/main)."""
    ev = threading.Event()

    def loader():
        rng = np.random.default_rng(0)
        i = 0
        while True:
            if i == 4:  # while assembling the 3rd superbatch (accum=2)
                ev.set()
            yield {
                "image": rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
                "depth": rng.uniform(1, 8, size=(2, 32, 32, 1)).astype(
                    np.float32),
                "keypoints_2d": rng.uniform(
                    0.1, 0.9, size=(2, 17, 2)).astype(np.float32),
                "joints_3d": (rng.normal(size=(2, 17, 3)) * 100).astype(
                    np.float32),
                "_pos": (0, (i + 1) * 2),
                "image_size": np.array([[32, 32]] * 2),
            }
            i += 1

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)
    prefix = str(tmp_path / "pre")
    _, last = train_model(
        state, "cnn", loader(), None,
        model=model, model_args=TINY.to_dict(),
        gradient_accumulation_steps=2, num_steps=100,
        eval_interval_steps=1000, preview_interval_steps=1000,
        checkpoint_prefix=prefix, stop_event=ev,
    )
    assert 1 <= last < 100
    meta = load_checkpoint_meta(f"{prefix}_cnn_step_{last}")
    assert meta["data_state"]["samples_consumed"] == last * 4


def test_retention_keeps_newest_and_best(tmp_path):
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)
    prefix = str(tmp_path / "ck")
    paths = {}
    for step in (1, 2, 3):
        paths[step] = save_checkpoint(
            f"{prefix}_cnn_step_{step}", state, "cnn", TINY.to_dict(),
        )
    # best at step 1; a later worse eval must not displace it
    assert record_best(prefix, "cnn", 1, 50.0, paths[1])
    assert not record_best(prefix, "cnn", 2, 60.0, paths[2])
    apply_retention(prefix, "cnn", keep_last=1)
    assert paths[1].exists()  # protected: best
    assert not paths[2].exists()
    assert paths[3].exists()  # newest
    with open(best_checkpoint_path(prefix, "cnn")) as f:
        best = json.load(f)
    assert best["step"] == 1 and best["mpjpe"] == 50.0
