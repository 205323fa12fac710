"""DepthPro port parity: the flax DepthProDepthEstimator loaded from an HF
``DepthProForDepthEstimation.save_pretrained`` directory (random-init tiny
config, the exact graph of apple/DepthPro-hf) must match the torch forward
numerically — canonical depth AND field of view — validating the dinov2
encoder, multi-scale patching/merging, deconv upsample stack, fusion stage,
heads, every key transform, and the torch-semantics bilinear resize."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import DepthProConfig, DepthProForDepthEstimation  # noqa: E402

TINY_VIT = dict(
    model_type="dinov2",
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=128,
    patch_size=4,
    image_size=16,
)

TINY_CFG = dict(
    fusion_hidden_size=16,
    patch_size=16,
    intermediate_hook_ids=[1, 0],
    intermediate_feature_dims=[16, 16],
    scaled_images_ratios=[0.25, 0.5, 1.0],
    scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
    scaled_images_feature_dims=[32, 32, 16],
    merge_padding_value=3,
    use_fov_model=True,
    num_fov_head_layers=2,
    image_model_config=TINY_VIT,
    patch_model_config=TINY_VIT,
    fov_model_config=TINY_VIT,
)

S = 64  # network input size for the tiny config


@pytest.fixture(scope="module")
def saved_dir(tmp_path_factory):
    torch.manual_seed(0)
    cfg = DepthProConfig(**TINY_CFG)
    tmodel = DepthProForDepthEstimation(cfg).eval()
    d = tmp_path_factory.mktemp("depthpro")
    tmodel.save_pretrained(d)
    return d, tmodel


def test_arch_inference(saved_dir):
    from pose3d_tpu.stage1.depthpro_port import (
        arch_from_state_dict,
        load_state_dict,
    )

    d, _ = saved_dir
    import json

    sd = load_state_dict(d / "model.safetensors")
    with open(d / "config.json") as f:
        config = json.load(f)
    arch = arch_from_state_dict(sd, config, image_size=S)
    assert arch.fusion_hidden_size == 16
    assert arch.vit.hidden_size == 32
    assert arch.vit.num_layers == 2
    assert arch.vit.num_heads == 2
    assert arch.vit.patch_size == 4
    assert arch.vit.image_size == 16
    assert arch.intermediate_hook_ids == (1, 0)
    assert arch.intermediate_feature_dims == (16, 16)
    assert arch.scaled_images_feature_dims == (32, 32, 16)
    assert arch.use_fov_model and arch.num_fov_head_layers == 2


def test_forward_parity(saved_dir):
    import jax

    from pose3d_tpu.stage1.depthpro_port import load_depth_pro

    d, tmodel = saved_dir
    model, variables = load_depth_pro(d / "model.safetensors",
                                      image_size=S)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, S, S, 3)).astype(np.float32)

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    jdepth, jfov = jax.jit(lambda v, x: model.apply(v, x))(variables, img)

    np.testing.assert_allclose(
        np.asarray(jfov), tout.field_of_view.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jdepth), tout.predicted_depth.numpy(),
        rtol=1e-3, atol=1e-3,
    )


def test_postprocess_matches_hf(saved_dir):
    """Metric conversion (FOV → focal → 1/clamp) must match the HF image
    processor's post_process_depth_estimation at network resolution."""
    import jax

    from pose3d_tpu.stage1.depthpro import postprocess_depth
    from pose3d_tpu.stage1.depthpro_port import load_depth_pro

    d, tmodel = saved_dir
    model, variables = load_depth_pro(d / "model.safetensors",
                                      image_size=S)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, S, S, 3)).astype(np.float32)
    jdepth, jfov = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
    metric = np.asarray(postprocess_depth(jdepth, jfov, width=S))

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    fov = tout.field_of_view[0]
    focal = 0.5 * S / torch.tan(0.5 * torch.deg2rad(fov))
    tdepth = tout.predicted_depth[0] * S / focal
    tmetric = 1.0 / torch.clamp(tdepth, min=1e-4, max=1e4)
    np.testing.assert_allclose(
        metric[0], tmetric.numpy(), rtol=1e-3, atol=1e-3
    )
