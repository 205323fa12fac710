"""Full pipeline end-to-end through the real CLI entry points on synthetic
data (BASELINE.json config #5): preprocess → chunker → split → train →
infer, all on CPU with a tiny model config."""

import json
from pathlib import Path

import cv2
import numpy as np
import pytest


TINY_CNN_ARGS = json.dumps({
    "image_size": [32, 32], "heatmap_size": 32, "heatmap_sigma": 2.0,
    "stage_channels": [8, 16, 32], "stage_depths": [1, 1, 1],
    "initial_channels": 8, "global_pool_size": 2, "global_feature_dim": 16,
    "regression_dims": [16],
})


@pytest.mark.slow
def test_full_pipeline(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)

    # --- raw images for two "subjects" -------------------------------
    raw = tmp_path / "images"
    for subject in (1, 5):
        sub = raw / f"s_{subject:02d}_act_02"
        sub.mkdir(parents=True)
        for i in range(6):
            img = rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
            cv2.imwrite(str(sub / f"frame_{i:06d}.jpg"), img)

    # --- 1. preprocess (stage-1 sweep) --------------------------------
    from pose3d_tpu.cli import preprocess as pp
    from pose3d_tpu.stage1.models import JaxStage1

    provider = JaxStage1(input_size=64)
    monkeypatch.setattr(
        "pose3d_tpu.stage1.models.JaxStage1", lambda **kw: provider
    )
    processed = tmp_path / "processed"
    n = pp.main([str(raw), str(processed), "--allow-untrained",
                 "--batch-size", "4", "--input-size", "64"])
    assert n == 12

    # --- annotations for the chunker ----------------------------------
    ann = tmp_path / "annotations"
    ann.mkdir()
    for subject in (1, 5):
        images, annotations, joints = [], [], {}
        for i in range(6):
            folder = f"s_{subject:02d}_act_02"
            img_id = subject * 1000 + i
            images.append({
                "id": img_id, "file_name": f"{folder}/frame_{i:06d}.jpg",
                "action_idx": 2, "subaction_idx": 1, "frame_idx": i,
                "cam_idx": 1, "subject": subject,
            })
            annotations.append({"image_id": img_id, "bbox": [0, 0, 50, 40]})
            joints.setdefault("2", {}).setdefault("1", {})[str(i)] = (
                rng.normal(size=(17, 3)) * 300 + [0, 0, 5000]
            ).tolist()
        json.dump({"images": images, "annotations": annotations},
                  open(ann / f"Human36M_subject{subject}_data.json", "w"))
        json.dump({"1": {"R": np.eye(3).tolist(), "t": [0, 0, 0],
                         "f": [1000, 1000], "c": [25, 20]}},
                  open(ann / f"Human36M_subject{subject}_camera.json", "w"))
        json.dump(joints,
                  open(ann / f"Human36M_subject{subject}_joint_3d.json", "w"))

    # --- 2. chunker -----------------------------------------------------
    from pose3d_tpu.cli import chunker as ck

    chunks = tmp_path / "chunks"
    ck.main([
        "--subjects", "1", "5", "--output", str(chunks),
        "--annotations-path", str(ann), "--images-path", str(raw),
        "--processed-path", str(processed), "--chunk-size", "6",
    ])
    assert len(list(chunks.glob("*.tar.gz"))) == 2

    # --- 3. split into train/test ---------------------------------------
    from pose3d_tpu.cli import split as sp

    dataset = tmp_path / "dataset"
    sp.main([
        "--input-dir", str(chunks), "--output-dir", str(dataset),
        "--train-subjects", "1", "--test-subjects", "5",
        "--staging-dir", str(tmp_path / "staging"),
        "--new-chunk-size", "100",
    ])
    assert list((dataset / "train").glob("*.tar.gz"))
    assert list((dataset / "test").glob("*.tar.gz"))

    # --- 4. train 2 steps -------------------------------------------------
    import os

    from pose3d_tpu.cli import main as train_cli

    os.chdir(tmp_path)
    last_step = train_cli.main([
        "--chunks-dir", str(dataset), "--cache-dir", str(tmp_path / "cache"),
        "--model-type", "cnn", "--model-args", TINY_CNN_ARGS,
        "--num-steps", "2", "--batch-size", "2", "--grad-accum", "2",
        "--eval-interval", "2", "--no-tensorboard",
        # exercises the in-jit separable augmentation path end-to-end
        "--augment-device",
    ])
    assert last_step == 2
    ckpt = Path("model_epoch__cnn_step_2")
    assert (ckpt / "meta.json").exists()
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["model_args"]["image_size"] == [32, 32]

    # --- 5. infer over the processed folder (cached stage-1) -------------
    from pose3d_tpu.cli import infer as inf

    img_dir = processed / "s_05_act_02"
    # cached provider needs images next to artifacts
    for f in (raw / "s_05_act_02").glob("*.jpg"):
        (img_dir / f.name).write_bytes(f.read_bytes())
    out = tmp_path / "infer_out"
    n_done = inf.main([
        "--checkpoint_path", str(ckpt), "--input_folder", str(img_dir),
        "--output_folder", str(out), "--stage1", "cached", "--visualize",
    ])
    assert n_done == 6
    npys = sorted(out.glob("*_pred_joints3d.npy"))
    assert len(npys) == 6
    joints = np.load(npys[0])
    assert joints.shape == (17, 3)
    assert np.all(np.isfinite(joints))
    assert len(list(out.glob("*_combined_viz.png"))) == 6

    # --- 6. resume mid-stream through the CLI, with retention -----------
    # The step-2 checkpoint recorded the data position (6 train samples
    # per epoch at 4/step → step 2 ended at epoch 1, 2 samples consumed).
    assert meta["data_state"] == {"epoch": 1, "samples_consumed": 2}
    last_step = train_cli.main([
        "--chunks-dir", str(dataset), "--cache-dir", str(tmp_path / "cache"),
        "--checkpoint", str(ckpt),
        "--num-steps", "4", "--batch-size", "2", "--grad-accum", "2",
        "--eval-interval", "2", "--no-tensorboard", "--augment-device",
        "--keep-checkpoints", "1",
    ])
    assert last_step == 4
    meta4 = json.loads(
        Path("model_epoch__cnn_step_4/meta.json").read_text()
    )
    # resumed positions are epoch-absolute and keep compounding
    assert meta4["data_state"] == {"epoch": 2, "samples_consumed": 4}
    # retention kept the newest (+ the protected best); best is recorded
    assert Path("model_epoch__cnn_best.json").exists()
    remaining = sorted(Path(".").glob("model_epoch__cnn_step_*"))
    assert Path("model_epoch__cnn_step_4") in remaining
    assert len(remaining) <= 2

    # --- 7. auto-resume: same command line picks up the newest ckpt ------
    last_step = train_cli.main([
        "--chunks-dir", str(dataset), "--cache-dir", str(tmp_path / "cache"),
        "--checkpoint", "auto", "--model-type", "cnn",
        "--num-steps", "6", "--batch-size", "2", "--grad-accum", "2",
        "--eval-interval", "100", "--no-tensorboard", "--augment-device",
    ])
    assert last_step == 6  # resumed from step 4, not from scratch
    assert Path("model_epoch__cnn_step_6/meta.json").exists()
