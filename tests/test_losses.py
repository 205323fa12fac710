"""Golden-value tests for the composite loss against the reference formulas
(src/loss.py:29-85) re-derived in numpy."""

import numpy as np

from pose3d_tpu.ops import composite_pose_loss, LossWeights

rng = np.random.default_rng(2)


def _numpy_components(pred, gt):
    mse = np.mean((pred - gt) ** 2)
    l1 = np.mean(np.abs(pred - gt))
    B, J, _ = pred.shape
    iu = np.triu_indices(J, k=1)
    pd = np.linalg.norm(pred[:, :, None] - pred[:, None, :], axis=3)[:, iu[0], iu[1]]
    gd = np.linalg.norm(gt[:, :, None] - gt[:, None, :], axis=3)[:, iu[0], iu[1]]
    ij = np.abs(pd - gd).mean()
    root = np.abs(pred[:, 0] - gt[:, 0]).mean()
    return mse, l1, ij, root


def test_components_match_numpy():
    pred = rng.normal(size=(4, 17, 3)).astype(np.float32) * 100
    gt = rng.normal(size=(4, 17, 3)).astype(np.float32) * 100
    total, comps = composite_pose_loss(pred, gt)
    mse, l1, ij, root = _numpy_components(pred.astype(np.float64), gt.astype(np.float64))
    np.testing.assert_allclose(float(comps["mse_loss"]), mse, rtol=1e-4)
    np.testing.assert_allclose(float(comps["l1_loss"]), l1, rtol=1e-4)
    np.testing.assert_allclose(float(comps["inter_joint_loss"]), ij, rtol=1e-4)
    np.testing.assert_allclose(float(comps["abs_root_loss"]), root, rtol=1e-4)
    expected_total = mse + l1 + 100.0 * ij + root  # default weights
    np.testing.assert_allclose(float(total), expected_total, rtol=1e-4)
    np.testing.assert_allclose(float(comps["total_loss"]), expected_total, rtol=1e-4)


def test_zero_loss_for_identical():
    x = rng.normal(size=(2, 17, 3)).astype(np.float32)
    total, comps = composite_pose_loss(x, x)
    assert float(total) < 1e-4  # eps in pairwise sqrt keeps it near but not exactly 0


def test_custom_weights():
    pred = rng.normal(size=(2, 17, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 17, 3)).astype(np.float32)
    w = LossWeights(mse=2.0, l1=0.0, inter_joint=0.0, abs_root=0.0)
    total, comps = composite_pose_loss(pred, gt, w)
    np.testing.assert_allclose(float(total), 2.0 * float(comps["mse_loss"]), rtol=1e-6)


def test_loss_is_differentiable():
    import jax

    pred = rng.normal(size=(2, 17, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 17, 3)).astype(np.float32)
    g = jax.grad(lambda p: composite_pose_loss(p, gt)[0])(pred)
    assert np.all(np.isfinite(np.asarray(g)))
