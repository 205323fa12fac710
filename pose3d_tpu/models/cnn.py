"""CNN lifting model (Flax / NHWC / TPU-first).

Architecture parity with the reference CNN (src/models/cnn.py): SE / ECA /
CoordAttention channel-spatial attention, ConvBnAct, depthwise-separable
convs, MobileNet-style inverted residuals, dual-path (residual+dense)
blocks, a weighted atrous spatial pyramid (WASP), multi-scale global
feature aggregation, and an MLP regression head. Stage assembly rules
(which block type / attention where) follow src/models/cnn.py:519-589
exactly so the architectures line up block-for-block.

TPU-first deviations from the reference's CUDA habits:
  * NHWC layout everywhere (XLA's native conv layout on TPU).
  * heatmap generation is the separable-Gaussian op
    (pose3d_tpu.ops.heatmap) producing NHWC directly; image, depth and
    heatmaps are concatenated once into the 21-channel input.
  * compute dtype bf16 / params fp32 (mixed precision on the MXU);
    BatchNorm statistics in fp32.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pose3d_tpu.core.config import CNNModelConfig
from pose3d_tpu.ops.activations import get_activation
from pose3d_tpu.ops.heatmap import gaussian_heatmaps
from pose3d_tpu.models.common import PoseRegressionHead

# Kaiming-normal fan_out init, the reference's conv/linear initialization
# (src/models/cnn.py:627-639: kaiming_normal_(mode="fan_out",
# nonlinearity="relu") for every Conv2d and Linear).
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class DotStatsBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are computed as ONE matrix product
    on the MXU: ones[1, N·H·W] @ [x | x²][N·H·W, 2C] instead of two VPU
    reductions. Motivation: in the full CNN XLA lays conv activations out
    batch-minor, and its reduce kernels over that layout run at ~65 GB/s
    (5× below a standalone reduce); routing the reduction through a matmul
    forces an MXU-friendly relayout. Semantics match nn.BatchNorm
    (momentum, eps, running stats, scale/bias).

    Round-1 finding: a single rank-1 dot with a multi-million contraction
    dimension crashed the remote TPU compiler (HTTP 500 from
    tpu_compile_helper). Round-2 fix: the contraction is CHUNKED — x is
    reshaped to [nb, n/nb, C] and reduced with a batched dot whose
    contraction dim stays ≤ ``max_chunk``, followed by a tiny [nb, C]
    VPU reduce. Numerics identical (fp32 accumulation either way);
    validated in tests/test_fast_bn.py."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    max_chunk: int = 1 << 16
    # "dot": batched MXU contraction; "pallas": fused one-pass Σx/Σx²
    # kernel (ops/pallas/bn_stats). ``pallas_min_pixels``: layers with
    # fewer than this many spatial positions per sample fall back to plain
    # XLA reduces — the full-graph TPU-compiler crash (CLAUDE.md) comes
    # from the SMALLEST late-stage layers, while the big early layers hold
    # ~97% of the reduce bytes; a per-sample-pixels gate is batch-size
    # independent.
    stats: str = "dot"
    pallas_min_pixels: int = 0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            n = x.size // C
            pixels = n // x.shape[0]
            if self.stats == "pallas" and pixels < self.pallas_min_pixels:
                xf = x.astype(jnp.float32)
                s1 = xf.sum(axis=tuple(range(x.ndim - 1)))
                s2 = (xf * xf).sum(axis=tuple(range(x.ndim - 1)))
            elif self.stats == "pallas":
                from pose3d_tpu.ops.pallas.bn_stats import bn_stats

                s1, s2 = bn_stats(
                    x.reshape(n, C).astype(self.dtype),
                    jax.default_backend() != "tpu",  # interpret off-TPU
                )
            else:
                # chunk the contraction dim (compiler limit, docstring);
                # zero-pad up to a multiple of the chunk size — zeros do
                # not perturb the Σx/Σx² sums, and padding keeps the chunk
                # near max_chunk even when n has no convenient divisor
                # (a prime n would otherwise degenerate to contraction
                # dim 1).
                nb = max(1, -(-n // self.max_chunk))
                chunk = -(-n // nb)
                x2 = x.reshape(n, C).astype(self.dtype)
                if nb * chunk != n:
                    x2 = jnp.pad(x2, ((0, nb * chunk - n), (0, 0)))
                x3 = x2.reshape(nb, chunk, C)
                # E[x] as a batched rank-1 MXU contraction; E[x²] as a
                # self-inner product per channel (one pass over x each).
                ones = jnp.ones((nb, 1, chunk), self.dtype)
                dims = (((2,), (1,)), ((0,), (0,)))
                s1 = jax.lax.dot_general(
                    ones, x3, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                ).sum(axis=(0, 1))                 # [C] fp32
                s2 = jax.lax.dot_general(
                    ones, x3 * x3, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                ).sum(axis=(0, 1))                 # [C] fp32
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var
                )

        # normalize in compute dtype like flax BatchNorm (stats stay fp32);
        # a full-activation fp32 normalize was implicated in TPU-compiler
        # crashes at full model scale
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(self.dtype)
        y = (x.astype(self.dtype) - mean.astype(self.dtype)) * inv
        return y + bias.astype(self.dtype)


def _norm(name: str, dtype, param_dtype):
    """Normalization factory (reference src/utils.py:184-195).

    "identity" (no normalization) and "batch_dot" (MXU-path statistics)
    are perf options beyond the reference's set."""

    def make(use_running_average: bool):
        if name == "identity":
            class _Id(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return x
            return _Id()
        if name == "batch_dot":
            return DotStatsBatchNorm(
                use_running_average=use_running_average,
                dtype=dtype, param_dtype=param_dtype,
            )
        if name.startswith("batch_pallas"):
            # optional threshold suffix: "batch_pallas:2048" applies the
            # kernel only to layers with ≥ that many pixels per sample
            min_px = int(name.split(":")[1]) if ":" in name else 0
            return DotStatsBatchNorm(
                use_running_average=use_running_average,
                dtype=dtype, param_dtype=param_dtype, stats="pallas",
                pallas_min_pixels=min_px,
            )
        if name == "batch":
            return nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                dtype=dtype,
                param_dtype=param_dtype,
            )
        if name == "instance":
            return nn.GroupNorm(
                group_size=1, dtype=dtype, param_dtype=param_dtype
            )
        if name == "layer":
            return nn.GroupNorm(num_groups=1, dtype=dtype, param_dtype=param_dtype)
        if name == "group":
            return lambda_group(dtype, param_dtype)
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            param_dtype=param_dtype,
        )

    return make


def lambda_group(dtype, param_dtype):
    class _G(nn.Module):
        @nn.compact
        def __call__(self, x):
            groups = min(32, x.shape[-1])
            return nn.GroupNorm(
                num_groups=groups, dtype=dtype, param_dtype=param_dtype
            )(x)

    return _G()


class ConvBnAct(nn.Module):
    """Conv → norm → activation (reference src/models/cnn.py:101-139).

    NHWC; padding auto-computed as (k-1)//2·dilation like the reference.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    use_bias: bool = False
    activation: Optional[str] = "silu"
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=kaiming_out,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        norm = _norm(self.normalization, self.dtype, self.param_dtype)(
            use_running_average=not train
        )
        x = norm(x)
        if self.activation:
            x = get_activation(self.activation)(x)
        return x


class SEBlock(nn.Module):
    """Squeeze-and-Excitation channel attention
    (reference src/models/cnn.py:9-26)."""

    reduction: int = 16
    activation: str = "silu"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))  # [B, C]
        y = nn.Dense(
            max(1, c // self.reduction), use_bias=False,
            kernel_init=kaiming_out,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(y)
        y = get_activation(self.activation)(y)
        y = nn.Dense(
            c, use_bias=False, kernel_init=kaiming_out,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ECABlock(nn.Module):
    """Efficient Channel Attention: 1-D conv over the pooled channel
    descriptor with an adaptive kernel size
    (reference src/models/cnn.py:29-45)."""

    gamma: int = 2
    b: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        t = int(abs(math.log2(c) + self.b) / self.gamma)
        k = t if t % 2 else t + 1
        y = x.mean(axis=(1, 2))[..., None]  # [B, C, 1]: C is "spatial"
        y = nn.Conv(
            1, (k,), padding=[( (k - 1) // 2, (k - 1) // 2 )], use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(y)
        y = nn.sigmoid(y[..., 0])  # [B, C]
        return x * y[:, None, None, :]


class CoordAttention(nn.Module):
    """Coordinate attention: factorized H/W pooling, shared bottleneck,
    per-axis sigmoid gates (reference src/models/cnn.py:48-98).
    The bottleneck uses BatchNorm+SiLU as hardcoded in the reference."""

    out_features: int
    reduction: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        mid = max(8, C // self.reduction)

        x_h = x.mean(axis=2)  # [B, H, C] — pooled over width
        x_w = x.mean(axis=1)  # [B, W, C] — pooled over height
        y = jnp.concatenate([x_h, x_w], axis=1)  # [B, H+W, C]

        y = nn.Conv(
            mid, (1,), use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(y)
        y = get_activation("silu")(y)

        y_h, y_w = y[:, :H], y[:, H:]
        a_h = nn.sigmoid(
            nn.Conv(self.out_features, (1,), dtype=self.dtype,
                    param_dtype=self.param_dtype)(y_h)
        )  # [B, H, C']
        a_w = nn.sigmoid(
            nn.Conv(self.out_features, (1,), dtype=self.dtype,
                    param_dtype=self.param_dtype)(y_w)
        )  # [B, W, C']
        return x * a_h[:, :, None, :] * a_w[:, None, :, :]


class DepthwiseSeparableConv(nn.Module):
    """Depthwise + pointwise ConvBnAct pair
    (reference src/models/cnn.py:142-186)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: str = "silu"
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = ConvBnAct(
            c_in, self.kernel_size, self.stride, groups=c_in,
            activation=self.activation, normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        x = ConvBnAct(
            self.features, 1, 1,
            activation=self.activation, normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        return x


def _attention_block(attention_type, features, se_reduction, activation,
                     dtype, param_dtype):
    if attention_type == "se":
        return SEBlock(se_reduction, activation, dtype, param_dtype)
    if attention_type == "eca":
        return ECABlock(dtype=dtype, param_dtype=param_dtype)
    if attention_type == "coord":
        return CoordAttention(features, dtype=dtype, param_dtype=param_dtype)
    return None


class InvertedResidual(nn.Module):
    """MobileNet-style inverted residual with optional SE/ECA/Coord attention
    (reference src/models/cnn.py:189-266)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    use_se: bool = True
    se_reduction: int = 16
    activation: str = "silu"
    normalization: str = "batch"
    residual_scale: float = 1.0
    attention_type: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        use_residual = c_in == self.features and self.stride == 1
        hidden = int(c_in * self.expand_ratio)

        y = x
        if self.expand_ratio != 1:
            y = ConvBnAct(
                hidden, 1, activation=self.activation,
                normalization=self.normalization,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(y, train)
        y = ConvBnAct(
            hidden, 3, self.stride, groups=hidden,
            activation=self.activation, normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(y, train)

        # Attention placement mirrors reference src/models/cnn.py:238-246.
        att_type = self.attention_type
        if att_type is None and self.use_se:
            att_type = "se"
        att = _attention_block(
            att_type, hidden, self.se_reduction, self.activation,
            self.dtype, self.param_dtype,
        )
        if att is not None:
            y = att(y, train) if isinstance(att, CoordAttention) else att(y)

        y = ConvBnAct(
            self.features, 1, activation=None,
            normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(y, train)

        if use_residual:
            return x + y * self.residual_scale
        return y


class DualPathBlock(nn.Module):
    """Residual + dense dual-path block with concat fusion
    (reference src/models/cnn.py:269-380)."""

    features: int
    stride: int = 1
    activation: str = "silu"
    normalization: str = "batch"
    residual_scale: float = 1.0
    attention_type: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        kw = dict(
            activation=self.activation, normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

        # Residual path: 1×1 → dw-separable (stride) → 1×1 (no act).
        res = ConvBnAct(self.features, 1, **kw)(x, train)
        res = DepthwiseSeparableConv(
            self.features, stride=self.stride,
            activation=self.activation, normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(res, train)
        res = ConvBnAct(
            self.features, 1, activation=None,
            normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(res, train)

        # Dense path at half width.
        dense_c = self.features // 2
        dense = ConvBnAct(dense_c, 1, **kw)(x, train)
        dense = DepthwiseSeparableConv(
            dense_c, stride=self.stride,
            activation=self.activation, normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(dense, train)

        # Shortcut (projection if shape changes).
        if self.stride != 1 or c_in != self.features:
            sc = ConvBnAct(
                self.features, 1, self.stride, activation=None,
                normalization=self.normalization,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x, train)
        else:
            sc = x
        res = res + sc * self.residual_scale

        out = jnp.concatenate([res, dense], axis=-1)
        out = ConvBnAct(self.features, 1, **kw)(out, train)

        att = _attention_block(
            self.attention_type, self.features, 16, self.activation,
            self.dtype, self.param_dtype,
        )
        if att is not None:
            out = att(out, train) if isinstance(att, CoordAttention) else att(out)
        return out


class WASPModule(nn.Module):
    """Weighted Atrous Spatial Pyramid: 1×1 + dilated 3×3 branches + global
    context, combined with softmax-learned branch weights
    (reference src/models/cnn.py:383-479)."""

    features: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    activation: str = "silu"
    normalization: str = "batch"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_branches = len(self.dilations) + 2
        w = self.param(
            "branch_weights",
            lambda rng: jnp.full((num_branches,), 1.0 / num_branches),
        )
        w = nn.softmax(w.astype(jnp.float32)).astype(self.dtype)

        kw = dict(
            activation=self.activation, normalization=self.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

        out = ConvBnAct(self.features, 1, **kw)(x, train) * w[0]
        for i, d in enumerate(self.dilations):
            out = out + ConvBnAct(
                self.features, 3, dilation=d, **kw
            )(x, train) * w[i + 1]

        # Global context branch: pool → 1×1 conv → broadcast back. The
        # reference bilinearly resizes a 1×1 map (cnn.py:464-468), which is
        # just a broadcast.
        g = x.mean(axis=(1, 2), keepdims=True)
        g = ConvBnAct(self.features, 1, **kw)(g, train)
        out = out + g * w[-1]

        return ConvBnAct(self.features, 1, **kw)(out, train)


def adaptive_avg_pool(x, out_size: int):
    """NHWC adaptive average pooling to (out_size, out_size).

    Matches torch.nn.AdaptiveAvgPool2d for the divisible case via an exact
    reshape-mean; for non-divisible sizes uses torch's bin boundaries
    (start = floor(i·H/O), end = ceil((i+1)·H/O)) with a small static loop —
    fine for the tiny spatial sizes this is applied to.
    """
    B, H, W, C = x.shape
    if H % out_size == 0 and W % out_size == 0:
        kh, kw = H // out_size, W // out_size
        return x.reshape(B, out_size, kh, out_size, kw, C).mean(axis=(2, 4))
    rows = []
    for i in range(out_size):
        h0, h1 = (i * H) // out_size, -(-((i + 1) * H) // out_size)
        cols = []
        for j in range(out_size):
            w0, w1 = (j * W) // out_size, -(-((j + 1) * W) // out_size)
            cols.append(x[:, h0:h1, w0:w1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class CNNPoseEstimation(nn.Module):
    """CNN 3D pose lifting model (reference src/models/cnn.py:482-665).

    forward(image [B,H,W,3], depth [B,H,W,1], keypoints_2d [B,J,2])
      -> joints_3d [B,J,3]

    Stage assembly (reference cnn.py:519-589): stage i's first block is a
    DualPathBlock when i>=2 and dual-path is enabled, else an
    InvertedResidual; later blocks alternate per the same parity rules;
    attention is "coord" for stages >=2 on leading blocks and alternates
    eca/se inside stages 0-1.
    """

    config: CNNModelConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # Rematerialize backbone blocks in the backward pass (trade FLOPs for
    # HBM). The full 10×10 grouped train step peaks at ~15.4 GB of the
    # 16 GB chip (--memory-report); this is the escape hatch when a
    # composition (device-aug + EMA + preview) pushes past it. Runtime
    # knob, not architecture — NOT recorded in checkpoint model_args.
    remat: bool = False

    @nn.compact
    def __call__(self, image, depth, keypoints_2d, *, train: bool = False):
        cfg = self.config
        # train is arg index 2 of __call__ (self=0), static under remat.
        # nn.remat renames the lifted class ("CheckpointInvertedResidual"),
        # which would change param paths — so blocks get EXPLICIT names
        # reproducing flax's auto-naming, keeping checkpoints loadable
        # across remat settings (equivalence: tests/test_models remat).
        if self.remat:
            _IR = nn.remat(InvertedResidual, static_argnums=(2,))
            _DP = nn.remat(DualPathBlock, static_argnums=(2,))
            _WA = nn.remat(WASPModule, static_argnums=(2,))
        else:
            _IR, _DP, _WA = InvertedResidual, DualPathBlock, WASPModule
        counts = {"ir": 0, "dp": 0}

        def IRBlock(*a, **k):
            k["name"] = f"InvertedResidual_{counts['ir']}"
            counts["ir"] += 1
            return _IR(*a, **k)

        def DPBlock(*a, **k):
            k["name"] = f"DualPathBlock_{counts['dp']}"
            counts["dp"] += 1
            return _DP(*a, **k)

        def WASP(*a, **k):
            return _WA(*a, **k, name="WASPModule_0")
        heatmaps = gaussian_heatmaps(
            keypoints_2d, cfg.heatmap_size, cfg.heatmap_sigma, dtype=self.dtype
        )
        x = jnp.concatenate(
            [image.astype(self.dtype), depth.astype(self.dtype), heatmaps],
            axis=-1,
        )

        kw = dict(
            activation=cfg.activation, normalization=cfg.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

        # Stem (reference cnn.py:492-509).
        x = ConvBnAct(
            cfg.initial_channels, cfg.initial_kernel_size, cfg.initial_stride,
            **kw,
        )(x, train)
        x = ConvBnAct(cfg.initial_channels, 3, 1, **kw)(x, train)

        # Backbone stages (reference cnn.py:519-589).
        for i in range(len(cfg.stage_channels)):
            out_c = cfg.stage_channels[i]
            depth_i = cfg.stage_depths[i]
            stride = cfg.stage_strides[i]
            expand = cfg.stage_expand_ratios[i]
            lead_att = "coord" if i >= 2 else "se"

            if i >= 2 and cfg.use_dual_path_blocks:
                x = DPBlock(
                    out_c, stride,
                    activation=cfg.activation, normalization=cfg.normalization,
                    residual_scale=cfg.residual_scale, attention_type=lead_att,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                )(x, train)
            else:
                x = IRBlock(
                    out_c, stride, expand,
                    use_se=cfg.use_se_blocks, se_reduction=cfg.se_reduction,
                    activation=cfg.activation, normalization=cfg.normalization,
                    residual_scale=cfg.residual_scale, attention_type=lead_att,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                )(x, train)

            for j in range(1, depth_i):
                if i >= 2 and cfg.use_dual_path_blocks and j % 2 == 0:
                    x = DPBlock(
                        out_c, 1,
                        activation=cfg.activation,
                        normalization=cfg.normalization,
                        residual_scale=cfg.residual_scale,
                        attention_type=lead_att,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                    )(x, train)
                else:
                    x = IRBlock(
                        out_c, 1, expand,
                        use_se=cfg.use_se_blocks,
                        se_reduction=cfg.se_reduction,
                        activation=cfg.activation,
                        normalization=cfg.normalization,
                        residual_scale=cfg.residual_scale,
                        attention_type="eca" if j % 2 == 0 else "se",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                    )(x, train)

        # WASP multi-scale context (reference cnn.py:592-598).
        x = WASP(
            cfg.stage_channels[-1],
            activation=cfg.activation, normalization=cfg.normalization,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)

        # Global features (reference cnn.py:601-613): adaptive pool →
        # 1×1 conv to global_feature_dim → ECA → global pool.
        x = adaptive_avg_pool(x, cfg.global_pool_size)
        x = ConvBnAct(cfg.global_feature_dim, 1, **kw)(x, train)
        x = ECABlock(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = x.mean(axis=(1, 2))  # [B, global_feature_dim]

        # Regression head (reference cnn.py:616-622).
        return PoseRegressionHead(
            cfg.num_joints,
            hidden_dims=cfg.regression_dims,
            dropout=cfg.regression_dropout,
            activation=cfg.activation,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, deterministic=not train)
