"""Tests for backbone freezing, DEP-P (absolute pose) decode, and the
double-buffered device feed."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.core.config import CNNModelConfig, TransformerModelConfig
from pose3d_tpu.models import init_model
from pose3d_tpu.train import create_train_state, make_train_step
from pose3d_tpu.train.loop import _device_prefetch, _superbatches

TINY_VIT = TransformerModelConfig(
    image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
    transformer_embed_dim=64, transformer_heads=4,
    vit_depth=2, vit_heads=4, final_encoder_depth=1,
    num_cross_modal_layers=1, regression_hidden_dims=(32,),
)


def _vit_batch(rng, a, b):
    return {
        "image": rng.uniform(size=(a, b, 64, 64, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(a, b, 64, 64, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(
            0.1, 0.9, size=(a, b, 17, 2)
        ).astype(np.float32),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(np.float32),
    }


def test_freeze_backbone_keeps_vit_fixed():
    model, variables = init_model(TINY_VIT, batch_size=2)
    state = create_train_state(
        model, variables,
        frozen_prefixes=("vit_backbone",),
        trainable_exceptions=("vit_backbone/patch_embed",),
    )
    step = make_train_step(model, donate=False)
    rng = np.random.default_rng(0)
    new_state, _ = step(state, _vit_batch(rng, 1, 2), jax.random.PRNGKey(0))

    def maxdiff(a, b):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return max(float(jnp.abs(x - y).max()) for x, y in zip(la, lb))

    vb_old = state.params["vit_backbone"]
    vb_new = new_state.params["vit_backbone"]
    # frozen blocks unchanged
    assert maxdiff(vb_old["block_0"], vb_new["block_0"]) == 0.0
    assert maxdiff(vb_old["norm"], vb_new["norm"]) == 0.0
    # adapted patch-embed still trains
    assert maxdiff(vb_old["patch_embed"], vb_new["patch_embed"]) > 0.0
    # non-backbone params still train
    assert maxdiff(
        state.params["pose_head"], new_state.params["pose_head"]
    ) > 0.0


def test_absolute_pose_decode(tmp_path):
    from helpers_synthetic import make_synthetic_chunk
    from pose3d_tpu.data.chunks import (
        extract_chunk, load_chunk_samples, decode_sample_meta,
    )

    tar, samples = make_synthetic_chunk(tmp_path, 0, num_samples=2,
                                        prefix="train")
    cdir = extract_chunk(tar, tmp_path / "x")
    loaded = load_chunk_samples(cdir)
    rel = decode_sample_meta(loaded[0], cdir, root_relative=True)
    absn = decode_sample_meta(loaded[0], cdir, root_relative=False)
    np.testing.assert_allclose(rel["joints_3d"][0], 0, atol=1e-6)
    raw = np.asarray(loaded[0]["joints_3d"], np.float32)
    np.testing.assert_allclose(absn["joints_3d"], raw, rtol=1e-6)
    assert np.abs(absn["joints_3d"][0]).max() > 100  # absolute root ~5 m


def test_device_prefetch_preserves_order_and_values():
    rng = np.random.default_rng(1)

    def loader():
        for i in range(5):
            yield {
                "image": np.full((2, 4, 4, 3), i, np.float32),
                "depth": np.full((2, 4, 4, 1), i, np.float32),
                "keypoints_2d": np.zeros((2, 17, 2), np.float32),
                "joints_3d": np.zeros((2, 17, 3), np.float32),
            }

    supers = _superbatches(loader(), 2, compact=False)
    out = list(_device_prefetch(supers, mesh=None))
    assert len(out) == 2
    for j, sb in enumerate(out):
        assert isinstance(sb["image"], jax.Array)
        np.testing.assert_allclose(
            np.asarray(sb["image"][0]).max(), 2 * j
        )


def test_compact_transfer_roundtrip():
    """uint8 compact encoding + on-device decode must reproduce the float
    batch to quantization precision, and the train step must accept it."""
    from pose3d_tpu.data.collate import compact_batch
    from pose3d_tpu.train.step import decompact_batch
    from pose3d_tpu.core.config import CNNModelConfig

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.uniform(size=(4, 16, 16, 3)).astype(np.float32),
        "depth": rng.uniform(1.5, 7.5, size=(4, 16, 16, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(4, 17, 2)).astype(np.float32),
        "joints_3d": rng.normal(size=(4, 17, 3)).astype(np.float32) * 100,
    }
    c = compact_batch(batch)
    assert c["image"].dtype == np.uint8
    assert c["depth"].dtype == np.uint8
    assert c["depth_scale"].shape == (4, 2)
    d = jax.jit(decompact_batch)(c)
    np.testing.assert_allclose(
        np.asarray(d["image"]), batch["image"], atol=1.0 / 255
    )
    # depth quantization error bounded by range/255
    rngs = (batch["depth"].max(axis=(1, 2, 3))
            - batch["depth"].min(axis=(1, 2, 3)))
    err = np.abs(np.asarray(d["depth"]) - batch["depth"])
    assert (err.max(axis=(1, 2, 3)) <= rngs / 255 + 1e-5).all()

    # a train step consumes the compact superbatch
    cfg = CNNModelConfig(
        image_size=(16, 16), heatmap_size=16, heatmap_sigma=2.0,
        stage_channels=(8, 8, 8), stage_depths=(1, 1, 1),
        initial_channels=8, global_pool_size=1, global_feature_dim=8,
        regression_dims=(8,),
    )
    model, variables = init_model(cfg, batch_size=4)
    state = create_train_state(model, variables)
    step = make_train_step(model, donate=False)
    sb = {k: v[None] for k, v in c.items()
          if k in ("image", "depth", "keypoints_2d", "joints_3d",
                   "depth_scale")}
    _, metrics = step(state, sb, jax.random.PRNGKey(0))
    assert np.isfinite(float(jax.device_get(metrics)["total_loss"]))


def test_device_prefetch_sharded_on_mesh():
    from pose3d_tpu.core.mesh import make_mesh

    mesh = make_mesh()

    def loader():
        for i in range(4):
            yield {
                "image": np.zeros((8, 4, 4, 3), np.float32),
                "depth": np.zeros((8, 4, 4, 1), np.float32),
                "keypoints_2d": np.zeros((8, 17, 2), np.float32),
                "joints_3d": np.zeros((8, 17, 3), np.float32),
            }

    out = list(_device_prefetch(_superbatches(loader(), 2), mesh))
    assert len(out) == 2
    sb = out[0]
    # microbatch axis replicated, batch axis sharded over 'data'
    sharding = sb["image"].sharding
    assert sharding.spec == jax.sharding.PartitionSpec(
        None, "data", None, None, None
    )


def test_evaluate_exact_with_ragged_tail():
    """Masked per-sample evaluation must equal the exact full-set metric
    even when the last batch is ragged (7 samples, batch size 4)."""
    from pose3d_tpu.train.loop import evaluate
    from pose3d_tpu.train.step import make_eval_step
    from pose3d_tpu.geometry import mpjpe as mpjpe_fn

    cfg = CNNModelConfig(
        image_size=(16, 16), heatmap_size=16, heatmap_sigma=2.0,
        stage_channels=(8, 8, 8), stage_depths=(1, 1, 1),
        initial_channels=8, global_pool_size=1, global_feature_dim=8,
        regression_dims=(8,),
    )
    model, variables = init_model(cfg, batch_size=4)
    state = create_train_state(model, variables)
    ev = make_eval_step(model, per_sample=True)

    rng = np.random.default_rng(3)
    n = 7
    samples = {
        "image": rng.uniform(size=(n, 16, 16, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(n, 16, 16, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(n, 17, 2)).astype(
            np.float32),
        "joints_3d": (rng.normal(size=(n, 17, 3)) * 100).astype(np.float32),
    }

    def loader():
        for lo in range(0, n, 4):
            yield {k: v[lo:lo + 4] for k, v in samples.items()}

    got = evaluate(ev, state, loader(), pad_to=4)

    # exact reference: run the model on all 7 at once
    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        samples["image"], samples["depth"], samples["keypoints_2d"],
        train=False,
    )
    exact = float(mpjpe_fn(np.asarray(preds), samples["joints_3d"]))
    np.testing.assert_allclose(got["mpjpe"], exact, rtol=1e-4)


def test_empty_val_loader_raises_at_preview(tmp_path):
    """An empty validation loader must fail with a clear RuntimeError at
    the first preview step, not escape as a bare StopIteration (review
    finding on the round-1 empty-validation guard)."""
    import os

    import pytest

    from helpers_synthetic import make_synthetic_dataset
    from pose3d_tpu.data import BatchLoader, StreamingChunkedDataset
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.loop import train_model
    from tests.test_train import TINY

    root = tmp_path / "chunks"
    make_synthetic_dataset(root, num_chunks=1, num_samples=6,
                           image_hw=(32, 32), prefix="train")
    train_ds = StreamingChunkedDataset(
        "train", str(root), image_size=(32, 32),
        cache_dir=tmp_path / "cache", decode_workers=2,
    )
    train_loader = BatchLoader(train_ds, batch_size=2, loop=True)

    class EmptyLoader:
        batch_size = 2

        def __iter__(self):
            return iter(())

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)
    os.chdir(tmp_path)
    with pytest.raises(RuntimeError, match="no batches"):
        train_model(
            state, "cnn", train_loader, EmptyLoader(),
            model=model, model_args=TINY.to_dict(),
            gradient_accumulation_steps=1,
            num_steps=2, eval_interval_steps=1000,
            preview_interval_steps=1,
            checkpoint_prefix=str(tmp_path / "ck_empty"),
        )
    # the crash path must still have preserved progress (finally-save)
    import glob

    assert glob.glob(str(tmp_path / "ck_empty_cnn_step_*"))


def test_per_action_eval_breakdown(tmp_path):
    """evaluate(per_action=True) buckets MPJPE/PA-MPJPE by the H3.6M
    action metadata; buckets are exact partitions of the overall mean."""
    import pytest

    from helpers_synthetic import make_synthetic_dataset
    from pose3d_tpu.data import BatchLoader, StreamingChunkedDataset
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.loop import evaluate
    from pose3d_tpu.train.step import make_eval_step
    from tests.test_train import TINY

    make_synthetic_dataset(tmp_path / "chunks", num_chunks=1,
                           num_samples=7, image_hw=(32, 32),
                           prefix="test", num_actions=3)
    ds = StreamingChunkedDataset(
        "test", str(tmp_path / "chunks"), image_size=(32, 32),
        cache_dir=tmp_path / "cache", shuffle=False, shuffle_chunks=False,
    )
    loader = BatchLoader(ds, batch_size=2, drop_last=False)

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)
    ev = make_eval_step(model, per_sample=True)
    metrics = evaluate(ev, state, loader, pad_to=2, per_action=True)

    pa = metrics["per_action"]
    assert set(pa) == {"2", "3", "4"}  # 7 samples over 3 actions
    assert sum(m["count"] for m in pa.values()) == 7
    weighted = sum(m["mpjpe"] * m["count"] for m in pa.values()) / 7
    assert metrics["mpjpe"] == pytest.approx(weighted, rel=1e-6)


def test_lr_schedules_and_grad_clip():
    """Opt-in LR schedules + global-norm clipping (the reference trains at
    a fixed LR with no clipping — constant stays the default)."""
    import optax
    import pytest

    from pose3d_tpu.train.state import make_lr_schedule, make_optimizer

    # constant without warmup stays a plain float (optimizer state parity
    # with all existing checkpoints)
    assert make_lr_schedule(1e-3) == 1e-3

    warm = make_lr_schedule(1e-3, warmup_steps=4)
    assert float(warm(0)) == 0.0
    assert float(warm(4)) == pytest.approx(1e-3)
    assert float(warm(1000)) == pytest.approx(1e-3)

    cos = make_lr_schedule(1e-3, schedule="cosine", warmup_steps=2,
                           decay_steps=10, end_lr_factor=0.1)
    assert float(cos(2)) == pytest.approx(1e-3)
    assert float(cos(10)) == pytest.approx(1e-4)

    lin = make_lr_schedule(1e-3, schedule="linear", decay_steps=10)
    assert float(lin(0)) == pytest.approx(1e-3)
    assert float(lin(10)) == pytest.approx(0.0, abs=1e-12)

    with pytest.raises(ValueError, match="decay_steps"):
        make_lr_schedule(1e-3, schedule="cosine")

    # clipping: optimizer(clip=c) on raw grads == optimizer(no clip) on
    # manually clipped grads
    params = {"w": jnp.ones((4,)), "b": jnp.ones((2,))}
    grads = {"w": jnp.full((4,), 30.0), "b": jnp.full((2,), 40.0)}
    tx_clip = make_optimizer(1e-3, clip_grad_norm=1.0)
    tx_plain = make_optimizer(1e-3)
    gnorm = optax.global_norm(grads)
    clipped = jax.tree_util.tree_map(lambda g: g / gnorm, grads)
    u1, _ = tx_clip.update(grads, tx_clip.init(params), params)
    u2, _ = tx_plain.update(clipped, tx_plain.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # a scheduled optimizer drives a real train state: warmup step 0 is a
    # no-op update (lr 0)
    from pose3d_tpu.train import create_train_state
    from tests.test_train import TINY

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(
        model, variables,
        learning_rate=make_lr_schedule(1e-3, warmup_steps=3),
    )
    step = make_train_step(model, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.uniform(size=(1, 2, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(1, 2, 32, 32, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(1, 2, 17, 2)).astype(
            np.float32),
        "joints_3d": (rng.normal(size=(1, 2, 17, 3)) * 100).astype(
            np.float32),
    }
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedule_logged_to_tb(tmp_path):
    """train_model(lr_schedule=...) emits Train/learning_rate scalars."""
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.loop import train_model
    from pose3d_tpu.train.state import make_lr_schedule
    from tests.test_train import TINY

    class Rec:
        def __init__(self):
            self.scalars = []

        def add_scalar(self, tag, value, step):
            self.scalars.append((tag, float(value), step))

        def add_image(self, *a, **k):
            pass

        def add_text(self, *a, **k):
            pass

        def flush(self):
            pass

    def loader():
        rng = np.random.default_rng(0)
        for _ in range(3):
            yield {
                "image": rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
                "depth": rng.uniform(1, 8, size=(2, 32, 32, 1)).astype(
                    np.float32),
                "keypoints_2d": rng.uniform(
                    0.1, 0.9, size=(2, 17, 2)).astype(np.float32),
                "joints_3d": (rng.normal(size=(2, 17, 3)) * 100).astype(
                    np.float32),
            }

    sched = make_lr_schedule(1e-3, schedule="cosine", decay_steps=10)
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, learning_rate=sched)
    writer = Rec()
    train_model(
        state, "cnn", loader(), None,
        model=model, model_args=TINY.to_dict(), writer=writer,
        gradient_accumulation_steps=1, num_steps=3,
        eval_interval_steps=1000, preview_interval_steps=1000,
        log_interval_steps=1,
        checkpoint_prefix=str(tmp_path / "lr"), lr_schedule=sched,
    )
    lrs = [(v, s) for t, v, s in writer.scalars
           if t == "Train/learning_rate"]
    assert lrs, "no Train/learning_rate scalars"
    import pytest as _pytest
    for v, s in lrs:
        assert v == _pytest.approx(float(sched(s)))


@pytest.mark.slow
def test_profile_window_writes_trace(tmp_path):
    """train_model(profile=(at, n, dir)) captures a jax.profiler xplane
    trace of the requested step window (the --profile-steps CLI path)."""
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.loop import train_model
    from tests.test_train import TINY

    def loader():
        rng = np.random.default_rng(0)
        for i in range(6):
            yield {
                "image": rng.uniform(size=(2, 32, 32, 3)).astype(np.float32),
                "depth": rng.uniform(1, 8, size=(2, 32, 32, 1)).astype(
                    np.float32),
                "keypoints_2d": rng.uniform(
                    0.1, 0.9, size=(2, 17, 2)).astype(np.float32),
                "joints_3d": (rng.normal(size=(2, 17, 3)) * 100).astype(
                    np.float32),
                "image_size": np.array([[32, 32]] * 2),
            }

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)
    prof_dir = tmp_path / "prof"
    train_model(
        state, "cnn", loader(), None,
        model=model, model_args=TINY.to_dict(),
        gradient_accumulation_steps=1, num_steps=5,
        eval_interval_steps=1000, preview_interval_steps=1000,
        checkpoint_prefix=str(tmp_path / "ck"),
        profile=(2, 2, str(prof_dir)),
    )
    traces = list(prof_dir.glob("plugins/profile/*/*.xplane.pb"))
    assert traces, f"no xplane trace under {prof_dir}"


def test_memory_report_on_train_step():
    """--memory-report: AOT memory accounting of the real train step, at
    the real argument shapes, without executing it."""
    from pose3d_tpu.utils.profiling import format_memory_report, memory_report

    cfg = CNNModelConfig(
        image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
        stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
        initial_channels=8, global_pool_size=2, global_feature_dim=16,
        regression_dims=(16,),
    )
    model, variables = init_model(cfg, batch_size=2)
    state = create_train_state(model, variables)
    step = make_train_step(model)  # donating — lowering must not execute
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.uniform(size=(2, 2, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(2, 2, 32, 32, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(2, 2, 17, 2)).astype(
            np.float32),
        "joints_3d": (rng.normal(size=(2, 2, 17, 3)) * 100).astype(
            np.float32),
    }
    rep = memory_report(step, state, batch, jax.random.PRNGKey(0))
    assert rep, "memory analysis should be available on CPU"
    assert rep["argument_bytes"] > 0 and rep["temp_bytes"] > 0
    assert "peak_bytes_estimate" in rep
    text = format_memory_report(rep)
    assert "argument=" in text and "peak_estimate=" in text
    # the donated state was NOT consumed: the real step still runs
    out_state, _ = step(state, batch, jax.random.PRNGKey(0))
    assert int(jax.device_get(out_state.step)) == 1
