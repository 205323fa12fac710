"""EMA weight averaging (opt-in production extra; the reference has no
weight averaging — SURVEY.md §5 checkpoint/resume: no best-model tracking,
no averaging). The EMA lives inside the jitted train step, rides the
TrainState/checkpoints, and drives validation + pose3d-eval --ema."""

import numpy as np
import jax
import pytest

from pose3d_tpu.core.config import CNNModelConfig
from pose3d_tpu.models import init_model
from pose3d_tpu.train import create_train_state, make_train_step
from pose3d_tpu.train.checkpoint import (
    checkpoint_has_ema,
    restore_train_state,
    save_checkpoint,
)
from pose3d_tpu.train.state import with_ema_params

TINY = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),
)


def _batch(rng, a=1, b=2):
    return {
        "image": rng.uniform(size=(a, b, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(a, b, 32, 32, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(a, b, 17, 2)).astype(
            np.float32),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(
            np.float32),
    }


def _ramped(d, t):
    """The step's effective decay at update t (1-based): the timm-style
    ramp min(d, (1+t)/(10+t)) that keeps short runs from being dominated
    by the random init (train/step.py _apply_update)."""
    return min(d, (1.0 + t) / (10.0 + t))


def test_ema_tracks_closed_form():
    """After k steps: ema_k folds p_k in with the RAMPED decay
    d_t = min(d, (1+t)/(10+t)) — verified leaf-by-leaf over 3 real
    optimizer steps."""
    d = 0.9
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    step = make_train_step(model, donate=False, ema_decay=d)

    leaves = jax.tree_util.tree_leaves
    expected = [np.asarray(x) for x in leaves(state.params)]
    expected_bs = [np.asarray(x) for x in leaves(state.batch_stats)]
    rng = np.random.default_rng(0)
    for i in range(3):
        state, _ = step(state, _batch(rng), jax.random.PRNGKey(i))
        dt = _ramped(d, i + 1)
        expected = [
            e * dt + (1 - dt) * np.asarray(p)
            for e, p in zip(expected, leaves(state.params))
        ]
        # the BN running stats are averaged with the SAME ramped decay
        # (timm ModelEma full-state semantics, train/step.py)
        expected_bs = [
            e * dt + (1 - dt) * np.asarray(s)
            for e, s in zip(expected_bs, leaves(state.batch_stats))
        ]
    for e, a in zip(expected, leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), e, rtol=1e-6, atol=1e-7)
    for e, a in zip(expected_bs, leaves(state.ema_batch_stats)):
        np.testing.assert_allclose(np.asarray(a), e, rtol=1e-6, atol=1e-7)
    # live params differ from the average
    assert any(
        not np.allclose(np.asarray(p), np.asarray(e))
        for p, e in zip(leaves(state.params), leaves(state.ema_params))
    )


def test_ema_ramp_converges_to_configured_decay():
    """Long horizons are unchanged by the ramp: once (1+t)/(10+t) exceeds
    the configured decay, the update is the plain constant-decay EMA."""
    d = 0.95
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    # (1+t)/(10+t) >= 0.95 ⇔ t >= 161; place the state deep into training
    state = state.replace(step=jax.numpy.int32(10_000))
    step = make_train_step(model, donate=False, ema_decay=d)

    leaves = jax.tree_util.tree_leaves
    before = [np.asarray(x) for x in leaves(state.ema_params)]
    state, _ = step(state, _batch(np.random.default_rng(3)),
                    jax.random.PRNGKey(0))
    for e0, e1, p in zip(before, leaves(state.ema_params),
                         leaves(state.params)):
        np.testing.assert_allclose(
            np.asarray(e1), e0 * d + (1 - d) * np.asarray(p),
            rtol=1e-6, atol=1e-7,
        )


def test_ema_short_run_not_init_dominated():
    """The round-4 failure mode: constant decay 0.999 left the EMA pinned
    at the random init for ~1000 steps (681.5 vs 511.0 mm on a 600-step
    run, docs/ROUND4.md §4). With the ramp, after a handful of steps the
    average must sit far closer to the live params than to the init."""
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    init = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    step = make_train_step(model, donate=False, ema_decay=0.999)
    rng = np.random.default_rng(7)
    for i in range(5):
        state, _ = step(state, _batch(rng), jax.random.PRNGKey(i))

    leaves = jax.tree_util.tree_leaves
    d_param = d_init = 0.0
    for e, p, i0 in zip(leaves(state.ema_params), leaves(state.params), init):
        d_param += float(np.sum((np.asarray(e) - np.asarray(p)) ** 2))
        d_init += float(np.sum((np.asarray(e) - i0) ** 2))
    # constant 0.999 decay after 5 steps would give d_init ≈ 0:
    # ema ≈ init to 0.5%. The ramp must pull the average well away.
    assert d_param < d_init, (
        f"EMA still init-dominated: |ema-params|²={d_param:.3e} "
        f">= |ema-init|²={d_init:.3e}"
    )


def test_ema_requires_enabled_state():
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)  # ema off
    step = make_train_step(model, donate=False, ema_decay=0.99)
    with pytest.raises(ValueError, match="ema"):
        step(state, _batch(np.random.default_rng(0)), jax.random.PRNGKey(0))


def test_with_ema_params_swap():
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    step = make_train_step(model, donate=False, ema_decay=0.5)
    state, _ = step(state, _batch(np.random.default_rng(1)),
                    jax.random.PRNGKey(0))
    sw = with_ema_params(state)
    for a, b in zip(jax.tree_util.tree_leaves(sw.params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the EMA view pairs the averaged weights with the AVERAGED BN stats
    # (live stats + averaged weights broke the 600-step CNN demo outright:
    # 2909 mm vs 491 mm raw, docs/ROUND5.md)
    for a, b in zip(jax.tree_util.tree_leaves(sw.batch_stats),
                    jax.tree_util.tree_leaves(state.ema_batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no-op when disabled
    plain = create_train_state(model, variables)
    assert with_ema_params(plain) is plain


def test_ema_checkpoint_roundtrip(tmp_path):
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    step = make_train_step(model, donate=False, ema_decay=0.8)
    state, _ = step(state, _batch(np.random.default_rng(2)),
                    jax.random.PRNGKey(0))

    path = save_checkpoint(tmp_path / "ck_cnn_step_1", state, "cnn",
                           TINY.to_dict())
    assert checkpoint_has_ema(path)

    model2, variables2 = init_model(TINY, batch_size=2)
    fresh = create_train_state(model2, variables2, ema=True)
    restored, _ = restore_train_state(fresh, path)
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_batch_stats),
                    jax.tree_util.tree_leaves(state.ema_batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_ema_checkpoint_seeds_stats_mirror(tmp_path):
    """EMA checkpoints recorded before the ema_batch_stats mirror existed
    (ema_params only) must restore with the stats mirror seeded from the
    LIVE running stats — reproducing their old eval behavior exactly,
    converging to the proper average as training continues."""
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    step = make_train_step(model, donate=False, ema_decay=0.8)
    state, _ = step(state, _batch(np.random.default_rng(5)),
                    jax.random.PRNGKey(0))
    legacy = state.replace(ema_batch_stats=None)  # the old on-disk schema
    path = save_checkpoint(tmp_path / "legacy_cnn_step_1", legacy, "cnn",
                           TINY.to_dict())
    assert checkpoint_has_ema(path)

    model2, variables2 = init_model(TINY, batch_size=2)
    fresh = create_train_state(model2, variables2, ema=True)
    restored, _ = restore_train_state(fresh, path)
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_batch_stats),
                    jax.tree_util.tree_leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pre_ema_checkpoint_restores_into_ema_state(tmp_path):
    """A checkpoint written WITHOUT ema must fully restore (params + opt
    state, no silent params-only fallback) into an EMA-enabled state,
    which keeps its freshly initialized ema_params."""
    model, variables = init_model(TINY, batch_size=2)
    plain = create_train_state(model, variables)
    step = make_train_step(model, donate=False)
    plain, _ = step(plain, _batch(np.random.default_rng(3)),
                    jax.random.PRNGKey(0))
    path = save_checkpoint(tmp_path / "old_cnn_step_1", plain, "cnn",
                           TINY.to_dict())
    assert not checkpoint_has_ema(path)

    model2, variables2 = init_model(TINY, batch_size=2)
    fresh = create_train_state(model2, variables2, ema=True)
    restored, _ = restore_train_state(fresh, path)
    # params AND optimizer state came from the checkpoint (a params-only
    # fallback would leave opt_state at init — all-zero moments)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(plain.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(plain.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ema stayed at the fresh init (not garbage, not missing)
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(fresh.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(restored.step)) == 1


def test_infer_loader_uses_ema(tmp_path):
    """cli/infer.load_pose_model(ema=True) serves the EMA weights; a
    checkpoint without them fails loudly."""
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    step = make_train_step(model, donate=False, ema_decay=0.5)
    state, _ = step(state, _batch(np.random.default_rng(4)),
                    jax.random.PRNGKey(0))
    path = save_checkpoint(tmp_path / "ck_cnn_step_1", state, "cnn",
                           TINY.to_dict())

    from pose3d_tpu.cli.infer import load_pose_model

    _, live_vars, _ = load_pose_model(path)
    _, ema_vars, _ = load_pose_model(path, ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(ema_vars["params"]),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(ema_vars["batch_stats"]),
                    jax.tree_util.tree_leaves(state.ema_batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(live_vars["params"]),
                        jax.tree_util.tree_leaves(ema_vars["params"]))
    )

    plain = create_train_state(model, variables)
    p2 = save_checkpoint(tmp_path / "plain_cnn_step_1", plain, "cnn",
                         TINY.to_dict())
    with pytest.raises(SystemExit, match="no EMA"):
        load_pose_model(p2, ema=True)


def test_latest_checkpoint(tmp_path):
    from pose3d_tpu.train.checkpoint import latest_checkpoint

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)
    prefix = str(tmp_path / "auto")
    assert latest_checkpoint(prefix, "cnn") is None
    for s in (2, 10, 9):  # numeric, not lexicographic, ordering
        save_checkpoint(f"{prefix}_cnn_step_{s}", state, "cnn",
                        TINY.to_dict())
    assert latest_checkpoint(prefix, "cnn").name == "auto_cnn_step_10"


def test_train_model_ema_validation(tmp_path):
    """train_model(ema_decay=...) checkpoints carry EMA weights and the
    validation path runs on the averaged weights."""
    from pose3d_tpu.train.loop import train_model

    def loader(n):
        rng = np.random.default_rng(0)
        for i in range(n):
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

    class Val:
        batch_size = 2

        def __iter__(self):
            return loader(2)

    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables, ema=True)
    prefix = str(tmp_path / "ema")
    state, last = train_model(
        state, "cnn", loader(6), Val(),
        model=model, model_args=TINY.to_dict(),
        gradient_accumulation_steps=2, num_steps=3,
        eval_interval_steps=2, preview_interval_steps=1000,
        checkpoint_prefix=prefix, ema_decay=0.9,
    )
    assert last == 3
    assert checkpoint_has_ema(f"{prefix}_cnn_step_2")
    assert state.ema_params is not None
