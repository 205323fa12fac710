"""Integration: JaxStage1 with ported pretrained-format weights — the
full ``--stage1 jax --kp-weights … --depth-weights …`` provider path.
Replica checkpoints (upstream state_dict formats, random weights) stand in
for real yolo11x-pose.pt / DepthPro safetensors; the numerics of the ports
themselves are covered by test_yolo11_port / test_depthpro_port."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def weight_files(tmp_path_factory):
    from transformers import DepthProConfig, DepthProForDepthEstimation

    from tests.test_depthpro_port import TINY_CFG
    from tests.yolo11_torch_replica import YOLO11PoseTorch

    d = tmp_path_factory.mktemp("stage1_weights")
    torch.manual_seed(0)
    yolo = YOLO11PoseTorch(scale="n").eval()
    torch.save(yolo.state_dict(), d / "yolo11n-pose.pt")

    dp = DepthProForDepthEstimation(DepthProConfig(**TINY_CFG)).eval()
    dp.save_pretrained(d / "depthpro")
    return d / "yolo11n-pose.pt", d / "depthpro" / "model.safetensors"


def test_provider_with_pretrained_weights(weight_files):
    from pose3d_tpu.stage1 import get_stage1_provider

    kp_w, depth_w = weight_files
    provider = get_stage1_provider(
        "jax",
        kp_weights=str(kp_w),
        depth_weights=str(depth_w),
        kp_input_size=64,
        depth_input_size=64,
    )
    rng = np.random.default_rng(0)
    images = [
        rng.integers(0, 255, size=(48, 80, 3), dtype=np.uint8).astype(
            np.uint8
        ),
        rng.integers(0, 255, size=(96, 64, 3), dtype=np.uint8).astype(
            np.uint8
        ),
    ]
    results = provider.predict_batch(images)
    assert len(results) == 2
    for im, r in zip(images, results):
        assert r.keypoints.shape == (17, 3)
        assert np.isfinite(r.keypoints).all()
        assert (r.keypoints[:, :2] >= 0).all()
        assert (r.keypoints[:, :2] <= 1).all()
        # depth at original resolution, metric-positive
        assert r.depth.shape == im.shape[:2]
        assert (r.depth > 0).all()
        assert r.depth_min <= r.depth_max


def test_provider_native_fallback_unchanged():
    """Without weights the provider still runs the native nets."""
    from pose3d_tpu.stage1 import get_stage1_provider

    provider = get_stage1_provider("jax", input_size=64)
    rng = np.random.default_rng(1)
    im = rng.integers(0, 255, size=(50, 70, 3), dtype=np.uint8)
    r = provider.predict_batch([im])[0]
    assert r.keypoints.shape == (17, 3)
    assert r.depth.shape == (50, 70)


def test_infer_cli_with_pretrained_stage1(weight_files, tmp_path):
    """infer CLI end-to-end with --stage1 jax and ported stage-1 weights:
    images → YOLO keypoints + DepthPro depth → lifting → .npy joints."""
    import cv2
    import jax.numpy as jnp

    from pose3d_tpu.cli import infer as inf
    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    kp_w, depth_w = weight_files

    cfg = CNNModelConfig.from_dict(dict(
        image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
        initial_channels=8, stage_channels=[8, 16, 16],
        stage_depths=[1, 1, 1], global_pool_size=2,
        global_feature_dim=16, regression_dims=[16], in_channels=21,
    ))
    model, variables = init_model(cfg, batch_size=1, dtype=jnp.float32)
    state = create_train_state(model, variables)
    ckpt = tmp_path / "ck"
    save_checkpoint(ckpt, state, model_type="cnn",
                    model_args=cfg.to_dict())

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    rng.integers(0, 255, size=(40, 56, 3), dtype=np.uint8))

    out = tmp_path / "out"
    n = inf.main([
        "--checkpoint_path", str(ckpt), "--input_folder", str(img_dir),
        "--output_folder", str(out), "--stage1", "jax",
        "--kp-weights", str(kp_w), "--depth-weights", str(depth_w),
        "--kp-input-size", "64", "--depth-input-size", "64",
        "--batch-size", "2",
    ])
    assert n == 3
    npys = sorted(out.glob("*_pred_joints3d.npy"))
    assert len(npys) == 3
    for f in npys:
        j = np.load(f)
        assert j.shape == (17, 3) and np.isfinite(j).all()


def test_provider_data_parallel_mesh(weight_files):
    """Stage-1 backends shard the batch over the mesh data axis — the
    multi-chip path for the 1M-image preprocess sweep. Must match the
    single-device outputs."""
    import jax

    from pose3d_tpu.core.mesh import make_mesh
    from pose3d_tpu.stage1 import get_stage1_provider

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    kp_w, depth_w = weight_files
    kw = dict(kp_weights=str(kp_w), depth_weights=str(depth_w),
              kp_input_size=64, depth_input_size=64)
    mesh = make_mesh((8,), ("data",))
    dp = get_stage1_provider("jax", mesh=mesh, **kw)
    single = get_stage1_provider("jax", **kw)

    rng = np.random.default_rng(7)
    # 5 images: exercises padding to the 8-wide data axis
    images = [rng.integers(0, 255, size=(40 + 4 * i, 56, 3),
                           dtype=np.uint8) for i in range(5)]
    a = dp.predict_batch(images)
    b = single.predict_batch(images)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(ra.keypoints, rb.keypoints,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ra.depth, rb.depth, rtol=1e-3,
                                   atol=1e-4)


def test_infer_cli_data_parallel_flag(tmp_path, weight_files):
    """--data-parallel on the infer CLI shards stage-1 batches over the
    8-device virtual mesh (parity with preprocess's flag)."""
    import cv2
    import jax.numpy as jnp

    from pose3d_tpu.cli import infer as inf
    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    kp_w, depth_w = weight_files
    cfg = CNNModelConfig.from_dict(dict(
        image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
        initial_channels=8, stage_channels=[8, 16, 16],
        stage_depths=[1, 1, 1], global_pool_size=2,
        global_feature_dim=16, regression_dims=[16], in_channels=21,
    ))
    model, variables = init_model(cfg, batch_size=1, dtype=jnp.float32)
    state = create_train_state(model, variables)
    ckpt = tmp_path / "ck"
    save_checkpoint(ckpt, state, model_type="cnn", model_args=cfg.to_dict())

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(6)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    rng.integers(0, 255, size=(40, 56, 3), dtype=np.uint8))

    out = tmp_path / "out_dp"
    n = inf.main([
        "--checkpoint_path", str(ckpt), "--input_folder", str(img_dir),
        "--output_folder", str(out), "--stage1", "jax",
        "--kp-weights", str(kp_w), "--depth-weights", str(depth_w),
        "--kp-input-size", "64", "--depth-input-size", "64",
        "--batch-size", "2", "--data-parallel",
    ])
    assert n == 2
    for f in sorted(out.glob("*_pred_joints3d.npy")):
        j = np.load(f)
        assert j.shape == (17, 3) and np.isfinite(j).all()
