"""Apple DepthPro, TPU-native (flax/NHWC), mirroring the HF graph exactly.

The reference's stage 1 runs ``DepthProForDepthEstimation`` per image for
metric monocular depth (/root/reference/preprocess.py:30-31,72-78;
infer.py:142-149,240-252). This module re-implements the architecture
natively so ``apple/DepthPro-hf`` safetensors port weight-for-weight
(stage1/depthpro_port.py) and inference runs batched + jitted on TPU.

Architecture (HF transformers models/depth_pro/modeling_depth_pro.py):
  * three Dinov2 ViT encoders — a *patch* encoder applied to 384×384
    crops of the 1536×1536 input at scales ×1 (25 overlapping patches),
    ×0.5 (9) and ×0.25 (1), an *image* encoder on the ×0.25 downsample,
    and a *FOV* encoder for the field-of-view head;
  * patch-grid reassembly with overlap trimming (merge_patches) and
    per-scale bilinear resizing to a power-of-two feature pyramid;
  * deconvolution upsample blocks + a DPT-style pre-activation residual
    fusion stage;
  * a depth head emitting canonical inverse depth, and a FOV head whose
    output converts it to metric depth (image_processing_depth_pro
    post_process_depth_estimation).

TPU-first: all 35 patches of an image ride the MXU as one ViT batch
(the torch reference already batches them; here the whole pipeline is one
jitted program — patching/merging are static reshapes, no host round
trips). Static shapes throughout; the patch grid layout is resolved at
trace time.

Flax child names mirror the torch state_dict (numeric segments joined by
``_``), so porting is a mechanical key transform shared with the YOLO11
port.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ViTArch:
    """Dinov2 encoder hyperparameters (HF Dinov2Config subset)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 16
    image_size: int = 384
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6

    @property
    def out_size(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class DepthProArch:
    """DepthPro hyperparameters (HF DepthProConfig subset; defaults =
    apple/DepthPro-hf)."""

    fusion_hidden_size: int = 256
    patch_size: int = 384
    intermediate_hook_ids: Tuple[int, ...] = (11, 5)
    intermediate_feature_dims: Tuple[int, ...] = (256, 256)
    scaled_images_ratios: Tuple[float, ...] = (0.25, 0.5, 1.0)
    scaled_images_overlap_ratios: Tuple[float, ...] = (0.0, 0.5, 0.25)
    scaled_images_feature_dims: Tuple[int, ...] = (1024, 1024, 512)
    merge_padding_value: int = 3
    use_fov_model: bool = True
    num_fov_head_layers: int = 2
    image_size: int = 1536  # network input resolution
    vit: ViTArch = field(default_factory=ViTArch)


# ---------------------------------------------------------------------------
# Dinov2 encoder
# ---------------------------------------------------------------------------


class Dinov2Layer(nn.Module):
    arch: ViTArch
    dtype: Any = jnp.float32
    # Measured null result (round 3, v5e): routing the 577-token,
    # head-dim-64 self-attention through the fused Pallas kernel gives
    # 3.56 img/s vs 3.61 for the XLA einsum at the full DepthPro b2@1536
    # sweep — inference-only attention at these shapes is already
    # well-fused by XLA (the kernel pays off in TRAINING, where it avoids
    # materializing probabilities for the backward). Default "xla"; the
    # switch remains available.
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, x):
        a = self.arch
        D = a.hidden_size
        head_dim = D // a.num_heads
        backend = self.attention_backend

        h = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=self.dtype,
                         name="norm1")(x)

        class _Attn(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, h):
                from pose3d_tpu.ops.attention import dot_product_attention

                B, T, _ = h.shape
                qkv = []
                for nm in ("query", "key", "value"):
                    t = nn.Dense(D, dtype=self.dtype, name=nm)(h)
                    qkv.append(t.reshape(B, T, a.num_heads, head_dim))
                q, k, v = qkv
                # softmax(qkᵀ/√d)·v — scale convention identical to the HF
                # reference (modeling_depth_pro.py attention).
                o = dot_product_attention(q, k, v, backend=backend)
                return o.astype(v.dtype).reshape(B, T, D)

        class _AttnBlock(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, h):
                o = _Attn(dtype=self.dtype, name="attention")(h)

                class _Out(nn.Module):
                    dtype: Any

                    @nn.compact
                    def __call__(self, o):
                        return nn.Dense(D, dtype=self.dtype,
                                        name="dense")(o)

                return _Out(dtype=self.dtype, name="output")(o)

        o = _AttnBlock(dtype=self.dtype, name="attention")(h)
        ls1 = self.param("layer_scale1",
                         lambda k: jnp.ones((D,), jnp.float32))
        x = x + o * ls1.astype(o.dtype)

        h = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=self.dtype,
                         name="norm2")(x)

        class _Mlp(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, h):
                h = nn.Dense(D * a.mlp_ratio, dtype=self.dtype,
                             name="fc1")(h)
                h = nn.gelu(h, approximate=False)
                return nn.Dense(D, dtype=self.dtype, name="fc2")(h)

        m = _Mlp(dtype=self.dtype, name="mlp")(h)
        ls2 = self.param("layer_scale2",
                         lambda k: jnp.ones((D,), jnp.float32))
        return x + m * ls2.astype(m.dtype)


class Dinov2Model(nn.Module):
    """HF Dinov2Model: patch embed + cls token + pos embed → L layers →
    final LayerNorm. Inputs must already be at ``arch.image_size`` (the
    DepthPro pipeline guarantees it), so no pos-embed interpolation."""

    arch: ViTArch
    dtype: Any = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, x, collect_hidden: Sequence[int] = ()):
        a = self.arch
        backend = self.attention_backend
        B = x.shape[0]
        D = a.hidden_size
        n_tok = a.out_size * a.out_size + 1

        class _Embeddings(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, x):
                class _PatchEmbeddings(nn.Module):
                    dtype: Any

                    @nn.compact
                    def __call__(self, x):
                        return nn.Conv(
                            D, (a.patch_size, a.patch_size),
                            strides=(a.patch_size, a.patch_size),
                            padding="VALID", dtype=self.dtype,
                            name="projection",
                        )(x)

                t = _PatchEmbeddings(dtype=self.dtype,
                                     name="patch_embeddings")(x)
                t = t.reshape(B, -1, D)
                cls = self.param(
                    "cls_token",
                    nn.initializers.truncated_normal(0.02), (1, 1, D),
                )
                pos = self.param(
                    "position_embeddings",
                    nn.initializers.truncated_normal(0.02), (1, n_tok, D),
                )
                t = jnp.concatenate(
                    [jnp.broadcast_to(cls.astype(t.dtype), (B, 1, D)), t],
                    axis=1,
                )
                return t + pos.astype(t.dtype)

        t = _Embeddings(dtype=self.dtype, name="embeddings")(x)

        class _Encoder(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, t):
                hidden = {}
                for i in range(a.num_layers):
                    t = Dinov2Layer(a, dtype=self.dtype,
                                    attention_backend=backend,
                                    name=f"layer_{i}")(t)
                    if i in collect_hidden:
                        hidden[i] = t
                return t, hidden

        t, hidden = _Encoder(dtype=self.dtype, name="encoder")(t)
        t = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(t)
        return t, hidden


# ---------------------------------------------------------------------------
# Patch split / merge (HF split_to_patches / merge_patches, NHWC)
# ---------------------------------------------------------------------------


def split_to_patches(x, patch_size: int, overlap_ratio: float):
    """[B, S, S, C] → [L·B, P, P, C], row-major patch order, patch-index
    major over batch (HF unfold + permute ordering)."""
    B, S, _, C = x.shape
    if S == patch_size:
        return x, 1
    if S < patch_size:
        # explicit, like HF's modeling_depth_pro.py:246-251 — otherwise
        # this fails much later as an inscrutable empty jnp.stack
        raise ValueError(
            f"scaled image size {S} is smaller than patch_size "
            f"{patch_size}: the DepthPro input_size is too small for the "
            "scale pyramid (needs >= 4*patch_size at the full scale)"
        )
    stride = int(patch_size * (1 - overlap_ratio))
    starts = list(range(0, S - patch_size + 1, stride))
    rows = []
    for sy in starts:
        for sx in starts:
            rows.append(x[:, sy:sy + patch_size, sx:sx + patch_size, :])
    out = jnp.stack(rows, axis=0)  # [L, B, P, P, C]
    L = len(rows)
    return out.reshape(L * B, patch_size, patch_size, C), L


def merge_patches(patches, batch_size: int, padding: int):
    """Inverse of split: [L·B, g, g, D] → [B, s·g', s·g', D] trimming
    ``padding`` from interior patch edges (HF merge_patches)."""
    LB, g, _, D = patches.shape
    L = LB // batch_size
    if L == 1:
        return patches
    s = int(math.isqrt(L))
    if L < 4:
        padding = 0
    padding = min(g // 4, padding)
    grid = patches.reshape(L, batch_size, g, g, D)
    rows = []
    for r in range(s):
        cols = []
        for c in range(s):
            box = grid[r * s + c]
            t = padding if r != 0 else 0
            b = padding if r != s - 1 else 0
            lft = padding if c != 0 else 0
            rgt = padding if c != s - 1 else 0
            cols.append(box[:, t:g - b, lft:g - rgt, :])
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def _linear_resize_weights(in_size: int, out_size: int):
    """Row-stochastic [out, in] matrix for 1-D bilinear resampling with
    torch ``F.interpolate(mode='bilinear', align_corners=False)``
    semantics — half-pixel centers, source clamped at 0, NO antialiasing
    (jax.image.resize antialiases on downscale, which DepthPro's torch
    reference does not; a dense matmul also rides the MXU)."""
    import numpy as np

    scale = in_size / out_size
    idx = np.arange(out_size, dtype=np.float64)
    src = np.maximum((idx + 0.5) * scale - 0.5, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), np.float32)
    w[np.arange(out_size), lo] += 1.0 - frac
    w[np.arange(out_size), hi] += frac
    return w


def _resize_bilinear(x, size_hw):
    _, H, W, _ = x.shape
    oh, ow = int(size_hw[0]), int(size_hw[1])
    if (H, W) == (oh, ow):
        return x
    wh = jnp.asarray(_linear_resize_weights(H, oh), x.dtype)
    ww = jnp.asarray(_linear_resize_weights(W, ow), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("pw,bowc->bopc", ww, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def reconstruct_feature_maps(tokens, grid: int, batch_size: int,
                             padding: int, output_size):
    """[N, T, D] ViT tokens → NHWC feature map [B, out, out, D]
    (HF reconstruct_feature_maps: drop cls, grid-reshape, merge, resize)."""
    N, _, D = tokens.shape
    feat = tokens[:, -(grid * grid):, :].reshape(N, grid, grid, D)
    feat = merge_patches(feat, batch_size=batch_size, padding=padding)
    return _resize_bilinear(feat, output_size)


# ---------------------------------------------------------------------------
# Upsample / fusion / heads
# ---------------------------------------------------------------------------


def _deconv2x(features: int, use_bias: bool, dtype, name: str):
    """ConvTranspose k=2 s=2 matching torch ConvTranspose2d numerics
    (the port pre-flips the kernel spatially; see depthpro_port)."""
    return nn.ConvTranspose(
        features, (2, 2), strides=(2, 2), padding="VALID",
        use_bias=use_bias, dtype=dtype, name=name,
    )


class FeatureUpsampleBlock(nn.Module):
    intermediate_dims: int
    output_dims: int
    n_upsample_layers: int
    use_proj: bool = True
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        i = 0
        if self.use_proj:
            x = nn.Conv(self.intermediate_dims, (1, 1), use_bias=self.bias,
                        dtype=self.dtype, name=f"layers_{i}")(x)
            i += 1
        for j in range(self.n_upsample_layers):
            x = _deconv2x(self.output_dims, self.bias, self.dtype,
                          f"layers_{i + j}")(x)
        return x


class PreActResidualLayer(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="convolution1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="convolution2")(x)
        return x + r


class FeatureFusionLayer(nn.Module):
    features: int
    use_deconv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            residual = PreActResidualLayer(
                self.features, dtype=self.dtype, name="residual_layer1"
            )(residual)
            x = x + residual
        x = PreActResidualLayer(self.features, dtype=self.dtype,
                                name="residual_layer2")(x)
        if self.use_deconv:
            x = _deconv2x(self.features, False, self.dtype, "deconv")(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="projection")(x)


class DepthProDepthEstimator(nn.Module):
    """Full DepthProForDepthEstimation graph.

    Input: [B, S, S, 3] pixel values, already preprocessed
    ((x/255 − 0.5)/0.5; HF DepthProImageProcessor).
    Output: (canonical_inverse_depth [B, S, S], fov_deg [B] or None).
    """

    arch: DepthProArch = DepthProArch()
    dtype: Any = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, pixel_values):
        a = self.arch
        vit = a.vit
        backend = self.attention_backend
        B, S = pixel_values.shape[0], pixel_values.shape[1]
        n_scales = len(a.scaled_images_ratios)
        n_hooks = len(a.intermediate_hook_ids)
        x = pixel_values.astype(self.dtype)

        # ---- encoder (depth_pro.encoder) -------------------------------
        class _PatchEncoder(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, x):
                scaled, counts = [], []
                for i, ratio in enumerate(a.scaled_images_ratios):
                    size = int(S * ratio)
                    img = _resize_bilinear(x, (size, size))
                    p, L = split_to_patches(
                        img, a.patch_size,
                        a.scaled_images_overlap_ratios[i],
                    )
                    scaled.append(p)
                    counts.append(L)
                # high-res patches first through the shared encoder
                patches = jnp.concatenate(scaled[::-1], axis=0)
                tokens, hidden = Dinov2Model(
                    vit, dtype=self.dtype, attention_backend=backend,
                    name="model",
                )(patches, collect_hidden=tuple(a.intermediate_hook_ids))

                # split back per scale (low-res first)
                sizes = [c * B for c in counts[::-1]]
                offs = [0]
                for sz in sizes:
                    offs.append(offs[-1] + sz)
                per_scale = [
                    tokens[offs[i]:offs[i + 1]] for i in range(n_scales)
                ][::-1]

                exponent = int(math.log2(S / vit.out_size))
                base = S // 2 ** exponent
                feats = []
                for i in range(n_scales):
                    pad = int(
                        a.merge_padding_value / a.scaled_images_ratios[i]
                    )
                    feats.append(reconstruct_feature_maps(
                        per_scale[i], vit.out_size, B, pad,
                        (base * 2 ** i, base * 2 ** i),
                    ))
                inter = []
                for hook in a.intermediate_hook_ids:
                    pad = int(
                        a.merge_padding_value / a.scaled_images_ratios[-1]
                    )
                    out = base * 2 ** (n_scales - 1)
                    inter.append(reconstruct_feature_maps(
                        hidden[hook], vit.out_size, B, pad, (out, out),
                    ))
                return feats + inter

        class _ImageEncoder(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, x):
                img = _resize_bilinear(x, (vit.image_size, vit.image_size))
                tokens, _ = Dinov2Model(vit, dtype=self.dtype,
                                        attention_backend=backend,
                                        name="model")(img)
                exponent = int(math.log2(S / vit.out_size))
                base = S // 2 ** exponent
                return reconstruct_feature_maps(
                    tokens, vit.out_size, B, 0, (base, base)
                )

        class _Encoder(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, x):
                pf = _PatchEncoder(dtype=self.dtype,
                                   name="patch_encoder")(x)
                imf = _ImageEncoder(dtype=self.dtype,
                                    name="image_encoder")(x)
                return [imf] + pf

        class _FeatureUpsample(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, features):
                features = list(features)
                features[0] = FeatureUpsampleBlock(
                    intermediate_dims=vit.hidden_size,
                    output_dims=a.scaled_images_feature_dims[0],
                    n_upsample_layers=1, use_proj=False, bias=True,
                    dtype=self.dtype, name="image_block",
                )(features[0])
                for i, dims in enumerate(a.scaled_images_feature_dims):
                    features[i + 1] = FeatureUpsampleBlock(
                        intermediate_dims=dims, output_dims=dims,
                        n_upsample_layers=1, dtype=self.dtype,
                        name=f"scaled_images_{i}",
                    )(features[i + 1])
                for i, dims in enumerate(a.intermediate_feature_dims):
                    inter_dims = (a.fusion_hidden_size if i == 0 else dims)
                    features[n_scales + i + 1] = FeatureUpsampleBlock(
                        intermediate_dims=inter_dims, output_dims=dims,
                        n_upsample_layers=2 + i, dtype=self.dtype,
                        name=f"intermediate_{i}",
                    )(features[n_scales + i + 1])
                return features

        class _FeatureProjection(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, features):
                dims = (tuple(a.scaled_images_feature_dims)
                        + tuple(a.intermediate_feature_dims))
                out = []
                for i, d in enumerate(dims):
                    if i == len(dims) - 1 and d == a.fusion_hidden_size:
                        out.append(features[i])  # Identity
                    else:
                        out.append(nn.Conv(
                            a.fusion_hidden_size, (3, 3),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=self.dtype, name=f"projections_{i}",
                        )(features[i]))
                return out

        class _Neck(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, features):
                features = _FeatureUpsample(
                    dtype=self.dtype, name="feature_upsample")(features)
                glob = jnp.concatenate([features[1], features[0]], axis=-1)
                glob = nn.Conv(
                    a.scaled_images_feature_dims[0], (1, 1),
                    dtype=self.dtype, name="fuse_image_with_low_res",
                )(glob)
                features = [glob] + features[2:]
                return _FeatureProjection(
                    dtype=self.dtype, name="feature_projection")(features)

        class _DepthProModel(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, x):
                features = _Encoder(dtype=self.dtype, name="encoder")(x)
                return _Neck(dtype=self.dtype, name="neck")(features)

        features = _DepthProModel(dtype=self.dtype, name="depth_pro")(x)

        # ---- fusion stage ----------------------------------------------
        class _FusionStage(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, hs):
                fused = None
                for i, h in enumerate(hs[:-1]):
                    layer = FeatureFusionLayer(
                        a.fusion_hidden_size, use_deconv=True,
                        dtype=self.dtype, name=f"intermediate_{i}",
                    )
                    fused = layer(h) if fused is None else layer(fused, h)
                return FeatureFusionLayer(
                    a.fusion_hidden_size, use_deconv=False,
                    dtype=self.dtype, name="final",
                )(fused, hs[-1])

        fused = _FusionStage(dtype=self.dtype, name="fusion_stage")(features)

        # ---- depth head --------------------------------------------------
        class _Head(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, h):
                f = a.fusion_hidden_size
                h = nn.Conv(f // 2, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="layers_0")(h)
                h = _deconv2x(f // 2, True, self.dtype, "layers_1")(h)
                h = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="layers_2")(h)
                h = nn.relu(h)
                h = nn.Conv(1, (1, 1), dtype=jnp.float32,
                            name="layers_4")(h)
                return nn.relu(h)[..., 0]

        depth = _Head(dtype=self.dtype, name="head")(fused)

        # ---- FOV model ---------------------------------------------------
        fov = None
        if a.use_fov_model:
            class _FovEncoder(nn.Module):
                dtype: Any

                @nn.compact
                def __call__(self, x):
                    img = _resize_bilinear(
                        x, (vit.image_size, vit.image_size))
                    tokens, _ = Dinov2Model(vit, dtype=self.dtype,
                                            attention_backend=backend,
                                            name="model")(img)
                    tokens = nn.Dense(a.fusion_hidden_size // 2,
                                      dtype=self.dtype, name="neck")(tokens)
                    exponent = int(math.log2(S / vit.out_size))
                    base = S // 2 ** exponent
                    return reconstruct_feature_maps(
                        tokens, vit.out_size, B, 0, (base, base)
                    )

            class _FovHead(nn.Module):
                dtype: Any

                @nn.compact
                def __call__(self, h):
                    h = _resize_bilinear(h, (vit.out_size, vit.out_size))
                    f = a.fusion_hidden_size
                    for i in range(a.num_fov_head_layers):
                        h = nn.Conv(
                            math.ceil(f / 2 ** (i + 2)), (3, 3),
                            strides=(2, 2), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"layers_{2 * i}",
                        )(h)
                        h = nn.relu(h)
                    k = int((vit.out_size - 1)
                            / 2 ** a.num_fov_head_layers + 1)
                    h = nn.Conv(
                        1, (k, k), padding="VALID", dtype=jnp.float32,
                        name=f"layers_{2 * a.num_fov_head_layers}",
                    )(h)
                    return h.reshape(B)

            class _FovModel(nn.Module):
                dtype: Any

                @nn.compact
                def __call__(self, x, global_features):
                    ff = _FovEncoder(dtype=self.dtype,
                                     name="fov_encoder")(x)
                    g = nn.Conv(
                        a.fusion_hidden_size // 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name="conv",
                    )(global_features)
                    g = nn.relu(g)
                    return _FovHead(dtype=self.dtype, name="head")(ff + g)

            fov = _FovModel(dtype=self.dtype, name="fov_model")(
                x, jax.lax.stop_gradient(features[0])
            )

        return depth, fov


def fov_scaled_inverse_depth(canonical_depth, fov_deg):
    """FOV calibration of the canonical inverse depth. HF's
    post_process_depth_estimation computes depth·width/focal with
    focal = 0.5·width/tan(fov/2) — the width factors cancel, leaving the
    resolution-independent canonical · 2·tan(fov/2)."""
    if fov_deg is None:
        return canonical_depth
    scale = 2.0 * jnp.tan(0.5 * jnp.deg2rad(fov_deg))
    return canonical_depth * scale[:, None, None]


def postprocess_depth(canonical_depth, fov_deg, width: int = 0):
    """HF post_process_depth_estimation: FOV-calibrated metric depth at
    network resolution (``width`` kept for signature parity — it cancels,
    see :func:`fov_scaled_inverse_depth`). Resize to the original image
    size on the host (cv2), as the reference does per image — resize the
    INVERSE depth then invert, matching HF's interpolate-then-invert
    order."""
    inv = fov_scaled_inverse_depth(canonical_depth, fov_deg)
    return 1.0 / jnp.clip(inv, 1e-4, 1e4)
