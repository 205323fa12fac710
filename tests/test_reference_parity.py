"""Bit-level parity vs the REFERENCE IMPLEMENTATION ITSELF.

These tests import the reference's torch modules from /root/reference
(read-only) and compare outputs on identical inputs — the strongest
possible evidence that this framework's numerics match: loss components,
Gaussian heatmaps, MPJPE, and the compat-mode PA-MPJPE.

Skipped when the reference tree or torch is unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not (REF / "src").exists():
    pytest.skip("reference tree not available", allow_module_level=True)

sys.path.insert(0, str(REF / "src"))

rng = np.random.default_rng(0)


def test_loss_parity():
    from loss import ComprehensivePoseLoss  # reference src/loss.py

    from pose3d_tpu.ops import composite_pose_loss, LossWeights

    pred = rng.normal(size=(6, 17, 3)).astype(np.float32) * 120
    gt = rng.normal(size=(6, 17, 3)).astype(np.float32) * 120

    ref_loss, ref_comps = ComprehensivePoseLoss()(
        torch.from_numpy(pred), torch.from_numpy(gt)
    )
    ours_total, ours_comps = composite_pose_loss(pred, gt, LossWeights())

    np.testing.assert_allclose(
        float(ours_total), float(ref_loss), rtol=1e-4
    )
    for k in ("mse_loss", "l1_loss", "inter_joint_loss", "abs_root_loss"):
        np.testing.assert_allclose(
            float(ours_comps[k]), float(ref_comps[k]), rtol=1e-4,
            err_msg=k,
        )


def test_heatmap_parity():
    from models.common import GaussianHeatmapGenerator  # reference

    from pose3d_tpu.ops.heatmap import gaussian_heatmaps_nchw

    kpts = rng.uniform(0.02, 0.98, size=(3, 17, 2)).astype(np.float32)
    # include invalid keypoints
    kpts[0, 0] = [-0.1, 0.5]
    kpts[1, 3] = [0.0, 0.2]

    gen = GaussianHeatmapGenerator(num_joints=17, heatmap_size=64, sigma=2.0)
    ref = gen(torch.from_numpy(kpts)).numpy()
    ours = np.asarray(gaussian_heatmaps_nchw(kpts, 64, 2.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mpjpe_parity():
    from utils import compute_mpjpe  # reference src/utils.py

    from pose3d_tpu.geometry import mpjpe

    pred = rng.normal(size=(5, 17, 3)).astype(np.float32) * 90
    gt = rng.normal(size=(5, 17, 3)).astype(np.float32) * 90
    ref = float(compute_mpjpe(torch.from_numpy(pred), torch.from_numpy(gt)))
    ours = float(mpjpe(pred, gt))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_pa_mpjpe_compat_parity():
    """compat_transposed_rotation=True must reproduce the reference's
    PA-MPJPE (including its transposed-rotation convention)."""
    from utils import compute_pa_mpjpe  # reference src/utils.py

    from pose3d_tpu.geometry import pa_mpjpe

    pred = rng.normal(size=(8, 17, 3)).astype(np.float32) * 70
    gt = rng.normal(size=(8, 17, 3)).astype(np.float32) * 70
    ref = float(
        compute_pa_mpjpe(torch.from_numpy(pred), torch.from_numpy(gt))
    )
    ours = float(pa_mpjpe(pred, gt, compat_transposed_rotation=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_world_to_camera_parity():
    from utils import world_to_camera_coords  # reference

    from pose3d_tpu.geometry import world_to_camera

    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    t = rng.normal(size=(3, 1)) * 100
    pts = rng.normal(size=(17, 3)) * 1000
    ref = world_to_camera_coords(pts.tolist(), R.tolist(), t.tolist())
    ours = np.asarray(world_to_camera(pts, R, t))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)
