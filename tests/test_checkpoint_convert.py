"""Full-model checkpoint conversion parity: a reference CNNPoseEstimation
with random weights is ported onto our Flax CNN and the COMPLETE forward
(heatmaps → stem → stages incl. dual-path/coord-attention → WASP → global
features → head) must match numerically in eval mode."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = Path("/root/reference")
if not (REF / "src").exists():
    pytest.skip("reference tree not available", allow_module_level=True)
sys.path.insert(0, str(REF / "src"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from model_config import ModelConfig as RefModelConfig  # noqa: E402
from models.cnn import CNNPoseEstimation as RefCNN  # noqa: E402

from pose3d_tpu.compat import port_reference_cnn  # noqa: E402
from pose3d_tpu.core.config import CNNModelConfig  # noqa: E402
from pose3d_tpu.models.cnn import CNNPoseEstimation  # noqa: E402

KW = dict(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    initial_channels=8, stage_channels=[8, 16, 16],
    stage_depths=[2, 2, 3], stage_strides=[2, 2, 2],
    stage_expand_ratios=[1, 3, 6],
    global_pool_size=2, global_feature_dim=16, regression_dims=[16, 12],
    se_reduction=4,
)


def test_full_cnn_forward_parity():
    torch.manual_seed(0)
    ref_cfg = RefModelConfig("cnn", **KW)
    tmodel = RefCNN(ref_cfg).eval()
    # randomize BN stats so eval mode is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.05)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.7)

    our_cfg = CNNModelConfig.from_dict({**KW, "in_channels": 21})
    variables = port_reference_cnn(tmodel.state_dict(), our_cfg)
    ours_model = CNNPoseEstimation(our_cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    dep = rng.uniform(1, 8, size=(2, 32, 32, 1)).astype(np.float32)
    kpt = rng.uniform(0.1, 0.9, size=(2, 17, 2)).astype(np.float32)

    with torch.no_grad():
        ref_out = tmodel(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(dep, (0, 3, 1, 2))),
            torch.from_numpy(kpt),
        ).numpy()

    ours = np.asarray(
        ours_model.apply(variables, jnp.asarray(img), jnp.asarray(dep),
                         jnp.asarray(kpt), train=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


def test_structure_matches_model_init():
    """The ported tree must have exactly the structure our model expects."""
    torch.manual_seed(1)
    ref_cfg = RefModelConfig("cnn", **KW)
    tmodel = RefCNN(ref_cfg)
    our_cfg = CNNModelConfig.from_dict({**KW, "in_channels": 21})
    ported = port_reference_cnn(tmodel.state_dict(), our_cfg)

    model = CNNPoseEstimation(our_cfg, dtype=jnp.float32)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)),
            jnp.full((1, 17, 2), 0.5), train=False,
        )
    )
    for col in ("params", "batch_stats"):
        es = jax.tree_util.tree_structure(dict(expected[col]))
        ps = jax.tree_util.tree_structure(ported[col])
        assert es == ps, f"{col} structure mismatch"
        for e, p in zip(
            jax.tree_util.tree_leaves(dict(expected[col])),
            jax.tree_util.tree_leaves(ported[col]),
        ):
            assert tuple(e.shape) == tuple(np.shape(p))


@pytest.mark.slow
def test_convert_cli_end_to_end(tmp_path):
    """reference .pth → converter CLI → our checkpoint → our infer path."""
    torch.manual_seed(2)
    ref_cfg = RefModelConfig("cnn", **KW)
    tmodel = RefCNN(ref_cfg)
    pth = tmp_path / "ref_model.pth"
    torch.save(
        {"step": 123, "model_state_dict": tmodel.state_dict(),
         "optimizer_state_dict": {}, "model_args": ref_cfg.to_dict(),
         "model_type": "cnn"},
        pth,
    )

    from pose3d_tpu.cli.convert import main as convert_main

    out = tmp_path / "converted"
    convert_main([str(pth), str(out)])

    # loads through the standard checkpoint path and predicts
    from pose3d_tpu.cli.infer import load_pose_model

    model, variables, cfg = load_pose_model(out)
    assert cfg.image_size == (32, 32)
    rng2 = np.random.default_rng(1)
    img = rng2.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    dep = rng2.uniform(1, 8, size=(1, 32, 32, 1)).astype(np.float32)
    kpt = rng2.uniform(0.1, 0.9, size=(1, 17, 2)).astype(np.float32)
    ours = np.asarray(
        model.apply(variables, img, dep, kpt, train=False)
    )
    tmodel.eval()
    with torch.no_grad():
        ref_out = tmodel(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(dep, (0, 3, 1, 2))),
            torch.from_numpy(kpt),
        ).numpy()
    np.testing.assert_allclose(ours, ref_out, rtol=2e-2, atol=2e-3)


def test_raw_pth_accepted_directly(tmp_path):
    """A raw reference .pth (no prior pose3d-convert) works with one
    command in infer/evaluate (reference infer.py:73-131 drop-in parity),
    including bare state_dicts and module. DDP prefixes."""
    torch.manual_seed(3)
    ref_cfg = RefModelConfig("cnn", **KW)
    tmodel = RefCNN(ref_cfg)

    # (a) self-describing checkpoint, straight into load_pose_model
    pth = tmp_path / "ref_model.pth"
    torch.save(
        {"step": 7, "model_state_dict": tmodel.state_dict(),
         "optimizer_state_dict": {}, "model_args": ref_cfg.to_dict(),
         "model_type": "cnn"},
        pth,
    )
    from pose3d_tpu.cli.infer import load_pose_model

    model, variables, cfg = load_pose_model(str(pth))
    assert cfg.image_size == (32, 32)
    # conversion is cached next to the file and reused
    assert (tmp_path / "ref_model.pth.jax").is_dir()
    import time as _time

    before = (tmp_path / "ref_model.pth.jax").stat().st_mtime
    load_pose_model(str(pth))
    assert (tmp_path / "ref_model.pth.jax").stat().st_mtime == before

    rng2 = np.random.default_rng(2)
    img = rng2.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    dep = rng2.uniform(1, 8, size=(1, 32, 32, 1)).astype(np.float32)
    kpt = rng2.uniform(0.1, 0.9, size=(1, 17, 2)).astype(np.float32)
    ours = np.asarray(model.apply(variables, img, dep, kpt, train=False))
    tmodel.eval()
    with torch.no_grad():
        ref_out = tmodel(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(dep, (0, 3, 1, 2))),
            torch.from_numpy(kpt),
        ).numpy()
    np.testing.assert_allclose(ours, ref_out, rtol=2e-2, atol=2e-3)

    # (b) bare state_dict with module. DDP prefixes — needs model_type
    # from the CLI (the default KW args differ from ModelConfig defaults,
    # so rebuild through explicit convert with matching model_args is NOT
    # exercised here; what is: prefix strip + bare-dict detection)
    bare = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
    pth2 = tmp_path / "bare.pth"
    torch.save(bare, pth2)
    from pose3d_tpu.cli.convert import convert

    with pytest.raises(Exception):
        # bare dict of a NON-default architecture cannot be rebuilt
        # without model_args — must raise loudly, not mis-load
        convert(str(pth2), str(tmp_path / "bare_out"), model_type="cnn")


def test_whole_module_checkpoint(tmp_path):
    """torch.save(model) (a pickled nn.Module, not a dict) must route
    through the state_dict extraction instead of raising TypeError."""
    torch.manual_seed(4)
    ref_cfg = RefModelConfig("cnn", **KW)
    tmodel = RefCNN(ref_cfg)
    pth = tmp_path / "whole_module.pth"
    torch.save(tmodel, pth)

    from pose3d_tpu.cli.convert import convert

    # KW differs from the default architecture, so the bare state_dict
    # cannot be rebuilt without model_args — the point is the loud,
    # guided error (not a TypeError crash on a non-dict checkpoint).
    with pytest.raises(Exception) as ei:
        convert(str(pth), str(tmp_path / "out"), model_type="cnn")
    assert not isinstance(ei.value, TypeError)


def test_raw_pth_exports_to_serving_artifact(tmp_path):
    """Reference .pth → StableHLO serving artifact in ONE command
    (pose3d-export auto-converts like infer/evaluate), and the artifact
    matches the reference torch model's output."""
    torch.manual_seed(5)
    ref_cfg = RefModelConfig("cnn", **KW)
    tmodel = RefCNN(ref_cfg)
    pth = tmp_path / "ref_model.pth"
    torch.save(
        {"step": 11, "model_state_dict": tmodel.state_dict(),
         "optimizer_state_dict": {}, "model_args": ref_cfg.to_dict(),
         "model_type": "cnn"},
        pth,
    )

    from pose3d_tpu.cli.export import main as export_main
    from pose3d_tpu.serve import load_exported, load_exported_meta

    out = export_main([
        "--checkpoint", str(pth), "--output", str(tmp_path / "served"),
        "--batch-size", "2",
    ])
    meta = load_exported_meta(out)
    assert meta["model_type"] == "cnn"
    assert meta["checkpoint_step"] == 11

    art = load_exported(out)
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    dep = rng.uniform(1, 8, size=(2, 32, 32, 1)).astype(np.float32)
    kpt = rng.uniform(0.1, 0.9, size=(2, 17, 2)).astype(np.float32)
    got = np.asarray(art.call(img, dep, kpt))

    tmodel.eval()
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(dep, (0, 3, 1, 2))),
            torch.from_numpy(kpt),
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)
