"""Accuracy-parity staging (VERDICT round-1 item 8): a reference torch
checkpoint converted with pose3d-convert and evaluated through the
eval-only CLI must report the SAME MPJPE / PA-MPJPE the reference's own
torch model + metric functions produce over the same synthetic chunk —
proving the whole metric pipeline (data → model → metrics) end-to-end
without training."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = Path("/root/reference")
if not (REF / "src").exists():
    pytest.skip("reference tree not available", allow_module_level=True)
if str(REF / "src") not in sys.path:
    sys.path.insert(0, str(REF / "src"))

from model_config import ModelConfig as RefModelConfig  # noqa: E402
from models.cnn import CNNPoseEstimation as RefCNN  # noqa: E402
from utils import compute_mpjpe, compute_pa_mpjpe  # noqa: E402

from tests.helpers_synthetic import make_synthetic_chunk  # noqa: E402
from tests.test_checkpoint_convert import KW  # noqa: E402


def test_converted_checkpoint_eval_metrics_match_reference(tmp_path):
    torch.manual_seed(3)
    ref_cfg = RefModelConfig("cnn", **KW)
    tmodel = RefCNN(ref_cfg).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.05)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.7
                )
    pth = tmp_path / "ref.pth"
    torch.save(
        {"step": 7, "model_state_dict": tmodel.state_dict(),
         "optimizer_state_dict": {}, "model_args": ref_cfg.to_dict(),
         "model_type": "cnn"},
        pth,
    )

    from pose3d_tpu.cli.convert import main as convert_main

    ck = tmp_path / "converted"
    convert_main([str(pth), str(ck)])

    chunks = tmp_path / "chunks"
    make_synthetic_chunk(chunks, 0, num_samples=6, image_hw=(32, 32),
                         prefix="test", seed=11)

    from pose3d_tpu.cli.evaluate import main as evaluate_main

    out_json = tmp_path / "metrics.json"
    metrics = evaluate_main([
        "--checkpoint", str(ck),
        "--chunks-dir", str(chunks),
        "--val-chunks", "0",
        "--batch-size", "4",
        "--cache-dir", str(tmp_path / "cache"),
        "--compat-pa-metric",  # reference PA convention (utils.py:72-165)
        "--attention-backend", "xla",
        "--json", str(out_json),
    ])
    assert out_json.exists() and json.loads(out_json.read_text())

    # Reference-side oracle: same data through the same loader, but the
    # TORCH model + the reference's own metric functions.
    from pose3d_tpu.data import BatchLoader, StreamingChunkedDataset
    from pose3d_tpu.train.step import decompact_batch

    ds = StreamingChunkedDataset(
        "test", str(chunks), chunk_indices=[0], image_size=(32, 32),
        cache_dir=tmp_path / "cache2", shuffle=False, shuffle_chunks=False,
        root_relative=True,
    )
    mpjpes, pas, count = [], [], 0
    for batch in BatchLoader(ds, 4, drop_last=False):
        b = {k: np.asarray(v) for k, v in decompact_batch(batch).items()
             if hasattr(v, "shape")}
        with torch.no_grad():
            pred = tmodel(
                torch.from_numpy(np.transpose(b["image"], (0, 3, 1, 2))),
                torch.from_numpy(np.transpose(b["depth"], (0, 3, 1, 2))),
                torch.from_numpy(b["keypoints_2d"]),
            )
        gt = torch.from_numpy(b["joints_3d"])
        n = gt.shape[0]
        mpjpes.append(float(compute_mpjpe(pred, gt)) * n)
        pas.append(float(compute_pa_mpjpe(pred, gt)) * n)
        count += n
    ref_mpjpe = sum(mpjpes) / count
    ref_pa = sum(pas) / count

    assert count == 6
    # forward parity is ~1e-3 relative; metrics are means of joint norms
    np.testing.assert_allclose(metrics["mpjpe"], ref_mpjpe, rtol=2e-2)
    np.testing.assert_allclose(metrics["pa_mpjpe"], ref_pa, rtol=2e-2)
