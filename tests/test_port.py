"""Weight-porting tests: a tiny timm-layout torch ViT vs. the ported Flax
ViTBackbone must produce matching features (validates every transpose /
reshape / inflation convention in stage1/port.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pose3d_tpu.models.transformer import ViTBackbone
from pose3d_tpu.stage1.port import (
    _inflate_patch_embed,
    _interpolate_pos_embed,
    merge_params,
    port_vit_backbone,
)

D, HEADS, DEPTH, P, IMG = 32, 4, 2, 8, 32  # tiny ViT: 16 patches
N_PATCH = (IMG // P) ** 2


class TorchBlock(torch.nn.Module):
    """Pre-LN ViT block with timm parameter names."""

    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(D, eps=1e-6)
        self.attn = torch.nn.Module()
        self.attn.qkv = torch.nn.Linear(D, 3 * D)
        self.attn.proj = torch.nn.Linear(D, D)
        self.norm2 = torch.nn.LayerNorm(D, eps=1e-6)
        self.mlp = torch.nn.Module()
        self.mlp.fc1 = torch.nn.Linear(D, 4 * D)
        self.mlp.fc2 = torch.nn.Linear(4 * D, D)

    def forward(self, x):
        B, T, _ = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, T, 3, HEADS, D // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)  # [B, H, T, hd]
        a = torch.softmax(
            q @ k.transpose(-2, -1) / (D // HEADS) ** 0.5, dim=-1
        )
        h = (a @ v).transpose(1, 2).reshape(B, T, D)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        x = x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
        return x


class TorchViT(torch.nn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, 1 + N_PATCH, D) * 0.02
        )
        self.patch_embed = torch.nn.Module()
        self.patch_embed.proj = torch.nn.Conv2d(in_ch, D, P, stride=P)
        self.blocks = torch.nn.ModuleList(TorchBlock() for _ in range(DEPTH))
        self.norm = torch.nn.LayerNorm(D, eps=1e-6)

    def forward(self, x):  # x: [B, C, H, W]
        B = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + self.pos_embed
        for b in self.blocks:
            t = b(t)
        return self.norm(t)


def test_ported_vit_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchViT(in_ch=3).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    ported = port_vit_backbone(
        sd, num_heads=HEADS, depth=DEPTH, in_channels=3, num_patches=N_PATCH
    )

    import jax
    import jax.numpy as jnp

    jmodel = ViTBackbone(
        embed_dim=D, depth=DEPTH, num_heads=HEADS, patch_size=P,
        dtype=jnp.float32,
    )
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
        deterministic=True,
    )
    # merge one block subtree first (exercises merge_params validation)…
    variables = merge_params(
        dict(variables), ported["block_0"], "block_0"
    )
    # …then use the full ported tree.
    variables = {"params": jax.tree_util.tree_map(np.asarray, ported)}

    x = np.random.default_rng(1).normal(size=(2, IMG, IMG, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        expected = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ).numpy()
    got = np.asarray(
        jmodel.apply(variables, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_patch_embed_inflation():
    w = np.random.default_rng(0).normal(size=(8, 3, 4, 4)).astype(np.float32)
    out = _inflate_patch_embed(w, 4)
    assert out.shape == (4, 4, 4, 8)
    np.testing.assert_allclose(
        out[:, :, :3], np.transpose(w, (2, 3, 1, 0)), rtol=1e-6
    )
    np.testing.assert_allclose(
        out[:, :, 3], np.transpose(w, (2, 3, 1, 0)).mean(axis=2), rtol=1e-6
    )


def test_pos_embed_interpolation():
    pos = np.random.default_rng(0).normal(size=(1, 1 + 16, 8)).astype(
        np.float32
    )
    out = _interpolate_pos_embed(pos, 64)  # 4x4 -> 8x8 grid
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(out[:, 0], pos[:, 0])  # CLS untouched


def test_inflated_4ch_port_runs():
    """Port a 3-channel torch ViT onto the 4-channel backbone (the
    reference's RGB+depth adaptation) and check the RGB-only equivalence:
    zero depth channel ⇒ same output as torch on RGB."""
    torch.manual_seed(1)
    tmodel = TorchViT(in_ch=3).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    ported = port_vit_backbone(
        sd, num_heads=HEADS, depth=DEPTH, in_channels=4, num_patches=N_PATCH
    )

    import jax.numpy as jnp

    jmodel = ViTBackbone(
        embed_dim=D, depth=DEPTH, num_heads=HEADS, patch_size=P,
        dtype=jnp.float32,
    )
    variables = {"params": ported}
    x = np.random.default_rng(2).normal(size=(1, IMG, IMG, 3)).astype(
        np.float32
    )
    x4 = np.concatenate([x, np.zeros((1, IMG, IMG, 1), np.float32)], axis=-1)
    with torch.no_grad():
        expected = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ).numpy()
    got = np.asarray(jmodel.apply(variables, jnp.asarray(x4),
                                  deterministic=True))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)
