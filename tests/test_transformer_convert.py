"""Transformer conversion parity (component level — the reference's full
TransformerPoseEstimation cannot be instantiated here because timm is not
installed; its non-backbone classes are imported with a stubbed timm, and
the timm-format backbone porting is covered by tests/test_port.py)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = Path("/root/reference")
if not (REF / "src").exists():
    pytest.skip("reference tree not available", allow_module_level=True)
sys.path.insert(0, str(REF / "src"))
sys.modules.setdefault("timm", types.ModuleType("timm"))  # satisfy import

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from models.transformers import (  # noqa: E402  (reference torch classes)
    CrossModalFusionBlock as RefFusion,
    PoseRegressionHead as RefHead,
    TransformerEncoderBlock as RefEncoder,
)

from pose3d_tpu.compat import (  # noqa: E402
    port_reference_encoder_block,
    port_reference_fusion_block,
)
from pose3d_tpu.models.transformer import (  # noqa: E402
    CrossModalFusionBlock,
    TransformerEncoderBlock,
)

D, HEADS = 32, 4
rng = np.random.default_rng(0)


def test_encoder_block_parity():
    torch.manual_seed(0)
    tmod = RefEncoder(D, HEADS, 4.0, 0.0, 0.0).eval()
    sd = {f"b.{k}": v for k, v in tmod.state_dict().items()}
    params = port_reference_encoder_block(sd, "b.", HEADS)

    x = rng.normal(size=(2, 10, D)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    ours = TransformerEncoderBlock(
        HEADS, 4.0, 0.0, 0.0, dtype=jnp.float32
    ).apply({"params": params}, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_fusion_block_parity():
    torch.manual_seed(1)
    tmod = RefFusion(D, HEADS, 4.0, 0.0, 0.0).eval()
    sd = {f"f.{k}": v for k, v in tmod.state_dict().items()}
    params = port_reference_fusion_block(sd, "f.", HEADS)

    xi = rng.normal(size=(2, 12, D)).astype(np.float32)
    xh = rng.normal(size=(2, 4, D)).astype(np.float32)
    with torch.no_grad():
        ref_i, ref_h = tmod(torch.from_numpy(xi), torch.from_numpy(xh))
    ours_i, ours_h = CrossModalFusionBlock(
        HEADS, 4.0, 0.0, 0.0, dtype=jnp.float32
    ).apply({"params": params}, jnp.asarray(xi), jnp.asarray(xh), True)
    np.testing.assert_allclose(
        np.asarray(ours_i), ref_i.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_h), ref_h.numpy(), rtol=2e-4, atol=2e-4
    )


def test_full_transformer_port_structure():
    """Assemble a complete reference-layout state_dict (torch modules for
    the non-backbone parts + synthetic timm-name backbone tensors) and
    check port_reference_transformer produces exactly our model's tree."""
    from pose3d_tpu.compat import port_reference_transformer
    from pose3d_tpu.core.config import TransformerModelConfig
    from pose3d_tpu.models.transformer import TransformerPoseEstimation

    cfg = TransformerModelConfig(
        image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
        transformer_embed_dim=D, transformer_heads=HEADS,
        vit_depth=2, vit_heads=HEADS, final_encoder_depth=2,
        num_cross_modal_layers=1, regression_hidden_dims=(24, 16),
    )
    torch.manual_seed(2)
    sd = {}
    # synthetic timm-format backbone (4-channel patch embed, as the
    # reference stores it post-inflation)
    n_patch = (64 // 16) ** 2
    sd["vit_backbone.cls_token"] = torch.randn(1, 1, D)
    sd["vit_backbone.pos_embed"] = torch.randn(1, 1 + n_patch, D)
    sd["vit_backbone.patch_embed.proj.weight"] = torch.randn(D, 4, 16, 16)
    sd["vit_backbone.patch_embed.proj.bias"] = torch.randn(D)
    for i in range(cfg.vit_depth):
        b = f"vit_backbone.blocks.{i}."
        sd[b + "norm1.weight"] = torch.randn(D)
        sd[b + "norm1.bias"] = torch.randn(D)
        sd[b + "attn.qkv.weight"] = torch.randn(3 * D, D)
        sd[b + "attn.qkv.bias"] = torch.randn(3 * D)
        sd[b + "attn.proj.weight"] = torch.randn(D, D)
        sd[b + "attn.proj.bias"] = torch.randn(D)
        sd[b + "norm2.weight"] = torch.randn(D)
        sd[b + "norm2.bias"] = torch.randn(D)
        sd[b + "mlp.fc1.weight"] = torch.randn(4 * D, D)
        sd[b + "mlp.fc1.bias"] = torch.randn(4 * D)
        sd[b + "mlp.fc2.weight"] = torch.randn(D, 4 * D)
        sd[b + "mlp.fc2.bias"] = torch.randn(D)
    sd["vit_backbone.norm.weight"] = torch.randn(D)
    sd["vit_backbone.norm.bias"] = torch.randn(D)

    # non-backbone parts from real reference modules
    hm_proj = torch.nn.Conv2d(17, D, 16, stride=16)
    sd.update({f"heatmap_patch_embed.proj.{k}": v
               for k, v in hm_proj.state_dict().items()})
    sd["pos_embed_hm"] = torch.randn(1, (32 // 16) ** 2, D)
    fusion = RefFusion(D, HEADS, 4.0, 0.1, 0.1)
    sd.update({f"cross_modal_fusion_layers.0.{k}": v
               for k, v in fusion.state_dict().items()})
    sd["final_cls_token"] = torch.randn(1, 1, D)
    sd["final_pos_embed"] = torch.randn(1, 1 + n_patch + 4, D)
    for i in range(cfg.final_encoder_depth):
        enc = RefEncoder(D, HEADS, 4.0, 0.1, 0.1)
        sd.update({f"final_encoder.{i}.{k}": v
                   for k, v in enc.state_dict().items()})
    sd["norm_out.weight"] = torch.randn(D)
    sd["norm_out.bias"] = torch.randn(D)
    head = RefHead(D, 17, (24, 16), 0.25)
    sd.update({f"pose_head.{k}": v for k, v in head.state_dict().items()})

    ported = port_reference_transformer(sd, cfg)

    model = TransformerPoseEstimation(cfg, attention_backend="xla",
                                      dtype=jnp.float32)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)),
            jnp.full((1, 17, 2), 0.5), train=False,
        )
    )
    es = jax.tree_util.tree_structure(dict(expected["params"]))
    ps = jax.tree_util.tree_structure(ported["params"])
    assert es == ps
    for e, p in zip(jax.tree_util.tree_leaves(dict(expected["params"])),
                    jax.tree_util.tree_leaves(ported["params"])):
        assert tuple(e.shape) == tuple(np.shape(p))

    # ported model runs
    out = model.apply(
        {"params": jax.tree_util.tree_map(np.asarray, ported["params"])},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)),
        jnp.full((1, 17, 2), 0.5), train=False,
    )
    assert out.shape == (1, 17, 3)
