"""Training-runtime tests: jitted train step (with gradient accumulation),
eval step, checkpoint round-trip, and the full loop on synthetic chunks —
all on the 8-device virtual CPU mesh where marked."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.core.config import CNNModelConfig
from pose3d_tpu.core.mesh import make_mesh
from pose3d_tpu.models import init_model
from pose3d_tpu.train import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    save_checkpoint,
    load_checkpoint,
)
from pose3d_tpu.train.checkpoint import restore_train_state
from pose3d_tpu.train.loop import train_model, _superbatches
from pose3d_tpu.train.step import make_predict_fn

TINY = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),
)


def _batch(rng, a, b):
    return {
        "image": rng.uniform(size=(a, b, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(a, b, 32, 32, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(a, b, 17, 2)).astype(
            np.float32
        ),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, learning_rate=1e-3)
    return model, state


def test_train_step_updates_params_and_step(setup):
    model, state = setup
    step = make_train_step(model, donate=False)
    rng = np.random.default_rng(0)
    batch = _batch(rng, 2, 2)  # A=2 accumulation, B=2
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == int(state.step) + 1
    m = jax.device_get(metrics)
    assert np.isfinite(m["total_loss"])
    assert set(m) == {
        "mse_loss", "l1_loss", "inter_joint_loss", "abs_root_loss",
        "total_loss",
    }
    # params changed
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_train_step_loss_decreases(setup):
    """A few steps on one fixed batch must reduce the loss."""
    model, state = setup
    step = make_train_step(model, donate=False)
    rng = np.random.default_rng(1)
    batch = _batch(rng, 1, 4)
    key = jax.random.PRNGKey(1)
    losses = []
    s = state
    for i in range(8):
        s, metrics = step(s, batch, jax.random.fold_in(key, i))
        losses.append(float(jax.device_get(metrics)["total_loss"]))
    assert losses[-1] < losses[0]


def test_accumulation_equivalence(setup):
    """Grad accumulation over A microbatches must match one big batch:
    same data → (approximately) same updated params, because loss terms are
    per-batch means and gradients are averaged over microbatches."""
    model, variables = init_model(TINY, batch_size=2)
    rng = np.random.default_rng(2)
    flat = _batch(rng, 1, 4)
    split = {k: v.reshape(2, 2, *v.shape[2:]) for k, v in flat.items()}

    # fresh states with identical params; disable dropout rng effects by
    # using the same key
    sA = create_train_state(model, variables)
    sB = create_train_state(model, variables)
    step = make_train_step(model, donate=False)
    key = jax.random.PRNGKey(0)
    outA, _ = step(sA, flat, key)
    outB, _ = step(sB, split, key)
    # MSE/L1 terms are per-microbatch means; averaging them over A equals
    # the big-batch mean, so updates agree up to numerical noise.
    da = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), outA.params, outB.params
    )
    assert max(jax.tree_util.tree_leaves(da)) < 5e-2  # same scale updates


def test_eval_step_metrics(setup):
    model, state = setup
    ev = make_eval_step(model)
    rng = np.random.default_rng(3)
    b = {k: v[0] for k, v in _batch(rng, 1, 4).items()}
    metrics, preds = ev(state, b)
    m = jax.device_get(metrics)
    assert preds.shape == (4, 17, 3)
    assert np.isfinite(m["mpjpe"]) and np.isfinite(m["pa_mpjpe"])
    assert m["pa_mpjpe"] <= m["mpjpe"] * 2  # sanity


def test_train_step_on_virtual_mesh(setup):
    """Data-parallel train step over the 8-device virtual mesh: batch dim
    sharded, state replicated, same metrics as single-device."""
    model, variables = init_model(TINY, batch_size=2)
    mesh = make_mesh((-1,), ("data",))
    assert mesh.shape["data"] == 8
    state = create_train_state(model, variables)
    step = make_train_step(model, mesh=mesh, donate=False)
    rng = np.random.default_rng(4)
    batch = _batch(rng, 2, 8)  # B=8 shards over 8 devices
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    m = jax.device_get(metrics)
    assert np.isfinite(m["total_loss"])

    # compare against unsharded execution
    step1 = make_train_step(model, donate=False)
    state1 = create_train_state(model, variables)
    _, m1 = step1(state1, batch, jax.random.PRNGKey(0))
    m1 = jax.device_get(m1)
    np.testing.assert_allclose(
        m["total_loss"], m1["total_loss"], rtol=2e-2
    )


def test_grouped_step_on_virtual_mesh(setup):
    """accum_mode="grouped" under data parallelism: the [A, B-sharded] ->
    [A*B] merge reshape plus per-group BN statistics must survive GSPMD
    (groups span device shards; the small [G,C] stat reductions reshard).
    Metrics must match the unsharded grouped execution."""
    model, variables = init_model(TINY, batch_size=2)
    mesh = make_mesh((-1,), ("data",))
    state = create_train_state(model, variables)
    step = make_train_step(
        model, mesh=mesh, donate=False, accum_mode="grouped"
    )
    rng = np.random.default_rng(9)
    batch = _batch(rng, 2, 8)
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    m = jax.device_get(metrics)
    assert np.isfinite(m["total_loss"])

    step1 = make_train_step(model, donate=False, accum_mode="grouped")
    state1 = create_train_state(model, variables)
    _, m1 = step1(state1, batch, jax.random.PRNGKey(0))
    m1 = jax.device_get(m1)
    np.testing.assert_allclose(m["total_loss"], m1["total_loss"], rtol=2e-2)


def test_predict_fn_sharded(setup):
    model, state = setup
    mesh = make_mesh()
    pred = make_predict_fn(model, mesh=mesh)
    rng = np.random.default_rng(5)
    b = {k: v[0] for k, v in _batch(rng, 1, 8).items()}
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = pred(variables, b["image"], b["depth"], b["keypoints_2d"])
    assert out.shape == (8, 17, 3)


def test_checkpoint_roundtrip(setup, tmp_path):
    model, state = setup
    path = tmp_path / "ckpt_cnn_step_5"
    save_checkpoint(path, state, "cnn", TINY.to_dict())
    tree, meta = load_checkpoint(path)
    assert meta["model_type"] == "cnn"
    assert meta["model_args"]["image_size"] == [32, 32]

    # restore into a fresh state: params must match bit-for-bit
    model2, variables2 = init_model(TINY, batch_size=2)
    fresh = create_train_state(model2, variables2)
    restored, meta2 = restore_train_state(fresh, path)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_superbatch_grouping():
    def loader():
        rng = np.random.default_rng(0)
        for _ in range(5):
            yield {
                "image": rng.uniform(size=(2, 8, 8, 3)).astype(np.float32),
                "depth": rng.uniform(size=(2, 8, 8, 1)).astype(np.float32),
                "keypoints_2d": rng.uniform(size=(2, 17, 2)).astype(np.float32),
                "joints_3d": rng.normal(size=(2, 17, 3)).astype(np.float32),
            }

    supers = list(_superbatches(loader(), 2))
    assert len(supers) == 2  # 5 raw batches → 2 superbatches, tail dropped
    assert supers[0]["image"].shape == (2, 2, 8, 8, 3)


def test_train_loop_end_to_end(tmp_path):
    """Mini end-to-end: synthetic chunks → loaders → train_model for 3 steps
    with eval+checkpoint at step 2."""
    from helpers_synthetic import make_synthetic_dataset
    from pose3d_tpu.data import StreamingChunkedDataset, BatchLoader

    root = tmp_path / "chunks"
    make_synthetic_dataset(root, num_chunks=1, num_samples=8,
                           image_hw=(32, 32), prefix="train")
    make_synthetic_dataset(root, num_chunks=1, num_samples=4,
                           image_hw=(32, 32), prefix="test", seed=7)

    train_ds = StreamingChunkedDataset(
        "train", str(root), image_size=(32, 32),
        cache_dir=tmp_path / "cache", decode_workers=2,
    )
    val_ds = StreamingChunkedDataset(
        "test", str(root), image_size=(32, 32),
        cache_dir=tmp_path / "cache", decode_workers=2,
    )
    train_loader = BatchLoader(train_ds, batch_size=2, loop=True)
    val_loader = BatchLoader(val_ds, batch_size=2)

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)
    import os
    os.chdir(tmp_path)
    state, last_step = train_model(
        state, "cnn", train_loader, val_loader,
        model=model, model_args=TINY.to_dict(),
        gradient_accumulation_steps=2,
        num_steps=3, eval_interval_steps=2, preview_interval_steps=1000,
        checkpoint_prefix=str(tmp_path / "ck"),
    )
    assert last_step == 3
    assert int(state.step) == 3
    assert (tmp_path / "ck_cnn_step_2" / "meta.json").exists()
