"""YOLO11-pose, TPU-native (flax/NHWC), with the exact upstream topology.

The reference's stage 1 runs ultralytics YOLO11x-pose per image for 17
COCO keypoints (/root/reference/preprocess.py:28,63; infer.py:138,162).
This module re-implements the YOLO11 pose architecture natively — same
graph, same parameterization — so pretrained ``yolo11{n,s,m,l,x}-pose.pt``
checkpoints port onto it weight-for-weight (see stage1/yolo_port.py) and
inference runs batched + jitted on TPU instead of per-image torch calls.

Topology (ultralytics yolo11.yaml + ultralytics/nn/modules):
  backbone: Conv×2 → C3k2(e=.25)×2 interleaved with strided Conv to /32,
            then SPPF and C2PSA (partial self-attention) — layers 0-10.
  head:     FPN/PAN — upsample+concat down to P3, strided path back up to
            P5 (layers 11-22), three C3k2 fusion blocks.
  pose head (layer 23): per-level box branch (DFL over 16 bins × 4 sides),
            class branch (depthwise-separable stacks), keypoint branch
            (17×3 per anchor cell).

Flax child names mirror the torch state_dict: torch ``model.23.cv4.0.1``
becomes flax ``model_23/cv4_0_1`` (numeric segments joined by ``_``), so
porting is a mechanical key transform, not a hand-written table.

Everything here is static-shape and jit-friendly; decoding (DFL expectation,
anchor offsets, keypoint scaling — ultralytics head.py Detect/Pose) is a
pure jnp function over the raw per-level outputs.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# depth multiple, width multiple, max_channels (ultralytics yolo11.yaml)
SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


class Conv(nn.Module):
    """ultralytics Conv: Conv2d(bias=False) + BatchNorm(eps 1e-3) + SiLU."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2  # autopad
        x = nn.Conv(
            self.c2, (self.k, self.k), strides=(self.s, self.s),
            padding=[(p, p), (p, p)], feature_group_count=self.g,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """cv1 (k[0]) → cv2 (k[1], groups g), optional residual."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], g=self.g, dtype=self.dtype,
                 name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C3k(nn.Module):
    """C3 with kernel-3 bottlenecks (n inner, e=1.0)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, k=(3, 3), e=1.0,
                           dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """C2f whose inner modules are C3k(n=2) when ``c3k`` else Bottleneck."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        outs = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                m = C3k(c, 2, self.shortcut, dtype=self.dtype,
                        name=f"m_{i}")
            else:
                m = Bottleneck(c, self.shortcut, k=(3, 3), e=0.5,
                               dtype=self.dtype, name=f"m_{i}")
            outs.append(m(outs[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling — fast: 3 stacked 5×5 stride-1 max-pools."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                            padding=[(2, 2), (2, 2)])
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class Attention(nn.Module):
    """PSA attention: conv-qkv, per-head softmax(qᵀk), depthwise positional
    branch on v (ultralytics/nn/modules/block.py Attention)."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32
    # Measured null result (round 3, v5e): "pallas" (the fused kernel,
    # which handles the PSA's asymmetric key_dim = head_dim/2) gives
    # 154.3 img/s vs 163.2 for "xla" at the full yolo11x b8@640 sweep —
    # XLA already fuses this small 400-token inference attention well,
    # and the kernel boundary costs more than it saves. Default stays
    # "xla"; the switch remains for training-style workloads.
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pose3d_tpu.ops.attention import dot_product_attention

        B, H, W, C = x.shape
        n = H * W
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim ** -0.5
        h = self.num_heads * (2 * key_dim + head_dim)

        qkv = Conv(h, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(B, n, self.num_heads, 2 * key_dim + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)

        # softmax(qkᵀ·key_dim^-0.5)·v — dot_product_attention applies the
        # identical 1/√key_dim scale internally.
        del scale
        o = dot_product_attention(
            q, k, v, backend=self.attention_backend
        ).astype(v.dtype)
        o = o.reshape(B, H, W, C)
        pe = Conv(self.dim, 3, g=self.dim, act=False, dtype=self.dtype,
                  name="pe")(v.reshape(B, H, W, C), train)
        return Conv(self.dim, 1, act=False, dtype=self.dtype,
                    name="proj")(o + pe, train)


class PSABlock(nn.Module):
    c: int
    num_heads: int
    dtype: Any = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention(self.c, self.num_heads, dtype=self.dtype,
                          attention_backend=self.attention_backend,
                          name="attn")(x, train)
        f = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn_0")(x, train)
        f = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn_1")(
            f, train)
        return x + f


class C2PSA(nn.Module):
    """Partial self-attention stage over half the channels (layer 10)."""

    c1: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c1 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, num_heads=c // 64, dtype=self.dtype,
                         attention_backend=self.attention_backend,
                         name=f"m_{i}")(b, train)
        return Conv(self.c1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


def _upsample2(x):
    """Exact nearest-neighbor 2× (torch nn.Upsample semantics)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class PoseHead(nn.Module):
    """Detect+Pose head (layer 23): per-level box/cls/kpt branches.

    Returns raw per-level tensors; decoding is in :func:`decode_pose`.
    Branch widths follow ultralytics Detect.__init__/Pose.__init__
    (legacy=False, i.e. the v11 depthwise class branch).
    """

    ch: Sequence[int]  # input channels per level, e.g. (384, 768, 768)
    nc: int = 1
    reg_max: int = 16
    kpt_shape: Tuple[int, int] = (17, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        c4 = max(self.ch[0] // 4, nk)
        out = []
        for i, x in enumerate(feats):
            ci = x.shape[-1]
            # box branch → 4 * reg_max logits
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), dtype=jnp.float32,
                          name=f"cv2_{i}_2")(b)
            # class branch (DWConv → 1×1) × 2 → nc logits
            cmid = Conv(ci, 3, g=ci, dtype=self.dtype,
                        name=f"cv3_{i}_0_0")(x, train)
            cmid = Conv(c3, 1, dtype=self.dtype,
                        name=f"cv3_{i}_0_1")(cmid, train)
            cmid = Conv(c3, 3, g=c3, dtype=self.dtype,
                        name=f"cv3_{i}_1_0")(cmid, train)
            cmid = Conv(c3, 1, dtype=self.dtype,
                        name=f"cv3_{i}_1_1")(cmid, train)
            cls = nn.Conv(self.nc, (1, 1), dtype=jnp.float32,
                          name=f"cv3_{i}_2")(cmid)
            # keypoint branch → 17 × 3 per cell
            kmid = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            kmid = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(kmid,
                                                                    train)
            kpt = nn.Conv(nk, (1, 1), dtype=jnp.float32,
                          name=f"cv4_{i}_2")(kmid)
            out.append((box, cls, kpt))
        return out


class YOLO11Pose(nn.Module):
    """The full yolo11{scale}-pose graph (ultralytics yolo11-pose.yaml).

    Input: [B, S, S, 3] float RGB in [0, 1] (S divisible by 32; upstream
    default 640 letterboxed). Output: list of per-level raw
    (box [B,h,w,64], cls [B,h,w,nc], kpt [B,h,w,51]) at strides 8/16/32.
    """

    scale: str = "x"
    nc: int = 1
    kpt_shape: Tuple[int, int] = (17, 3)
    dtype: Any = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, images, train: bool = False):
        d, wmul, mc = SCALES[self.scale]
        c = lambda ch: make_divisible(min(ch, mc) * wmul)  # noqa: E731
        rep = max(round(2 * d), 1)
        # parse_model forces c3k=True for every C3k2 at scales m/l/x
        force = self.scale in ("m", "l", "x")
        dt = self.dtype

        x = images.astype(dt)
        x = Conv(c(64), 3, 2, dtype=dt, name="model_0")(x, train)    # P1/2
        x = Conv(c(128), 3, 2, dtype=dt, name="model_1")(x, train)   # P2/4
        x = C3k2(c(256), rep, c3k=force, e=0.25, dtype=dt,
                 name="model_2")(x, train)
        x = Conv(c(256), 3, 2, dtype=dt, name="model_3")(x, train)   # P3/8
        x4 = C3k2(c(512), rep, c3k=force, e=0.25, dtype=dt,
                  name="model_4")(x, train)
        x = Conv(c(512), 3, 2, dtype=dt, name="model_5")(x4, train)  # P4/16
        x6 = C3k2(c(512), rep, c3k=True, dtype=dt,
                  name="model_6")(x, train)
        x = Conv(c(1024), 3, 2, dtype=dt, name="model_7")(x6, train)  # P5/32
        x = C3k2(c(1024), rep, c3k=True, dtype=dt,
                 name="model_8")(x, train)
        x = SPPF(c(1024), dtype=dt, name="model_9")(x, train)
        x10 = C2PSA(c(1024), rep, dtype=dt,
                    attention_backend=self.attention_backend,
                    name="model_10")(x, train)

        # FPN top-down
        x = jnp.concatenate([_upsample2(x10), x6], axis=-1)          # 11+12
        x13 = C3k2(c(512), rep, c3k=force, dtype=dt,
                   name="model_13")(x, train)
        x = jnp.concatenate([_upsample2(x13), x4], axis=-1)          # 14+15
        x16 = C3k2(c(256), rep, c3k=force, dtype=dt,
                   name="model_16")(x, train)                        # P3 out
        # PAN bottom-up
        x = Conv(c(256), 3, 2, dtype=dt, name="model_17")(x16, train)
        x = jnp.concatenate([x, x13], axis=-1)                       # 18
        x19 = C3k2(c(512), rep, c3k=force, dtype=dt,
                   name="model_19")(x, train)                        # P4 out
        x = Conv(c(512), 3, 2, dtype=dt, name="model_20")(x19, train)
        x = jnp.concatenate([x, x10], axis=-1)                       # 21
        x22 = C3k2(c(1024), rep, c3k=True, dtype=dt,
                   name="model_22")(x, train)                        # P5 out

        ch = (c(256), c(512), c(1024))
        return PoseHead(ch, self.nc, kpt_shape=self.kpt_shape, dtype=dt,
                        name="model_23")((x16, x19, x22), train)


# ---------------------------------------------------------------------------
# Decoding (ultralytics/nn/modules/head.py Detect._inference + Pose)
# ---------------------------------------------------------------------------


def decode_pose(raw, strides=(8, 16, 32), kpt_shape=(17, 3)):
    """Raw per-level heads → (boxes_xywh [B,A,4] px, scores [B,A,nc],
    kpts [B,A,J,3] with pixel x/y + sigmoid conf), all in the network
    input frame. A = Σ h·w over levels.

    Box: DFL — softmax over 16 bins per side, expectation with bin index
    (the fixed arange conv in ultralytics DFL), then dist2bbox around the
    (cell+0.5) anchor, scaled by the level stride.
    Keypoints: (2·raw + anchor − 0.5) · stride, conf sigmoid
    (Pose.kpts_decode).
    """
    nj, nd = kpt_shape
    boxes, scores, kpts = [], [], []
    for (box, cls, kpt), stride in zip(raw, strides):
        B, h, w, _ = box.shape
        ax = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ay = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        ax = jnp.broadcast_to(ax, (h, w)).reshape(-1)
        ay = jnp.broadcast_to(ay, (h, w)).reshape(-1)

        bl = box.reshape(B, h * w, 4, 16)  # side-major bins (DFL layout)
        dist = jnp.einsum(
            "bas i, i -> bas",
            jax.nn.softmax(bl.astype(jnp.float32), axis=-1),
            jnp.arange(16, dtype=jnp.float32),
        )
        lt, rb = dist[..., :2], dist[..., 2:]
        anchor = jnp.stack([ax, ay], axis=-1)[None]           # [1, A, 2]
        x1y1 = anchor - lt
        x2y2 = anchor + rb
        cxy = (x1y1 + x2y2) / 2 * stride
        wh = (x2y2 - x1y1) * stride
        boxes.append(jnp.concatenate([cxy, wh], axis=-1))
        scores.append(jax.nn.sigmoid(cls.reshape(B, h * w, -1)
                                     .astype(jnp.float32)))

        k = kpt.reshape(B, h * w, nj, nd).astype(jnp.float32)
        kx = (k[..., 0] * 2.0 + (ax[None, :, None] - 0.5)) * stride
        ky = (k[..., 1] * 2.0 + (ay[None, :, None] - 0.5)) * stride
        if nd == 3:
            k = jnp.stack([kx, ky, jax.nn.sigmoid(k[..., 2])], axis=-1)
        else:
            k = jnp.stack([kx, ky], axis=-1)
        kpts.append(k)
    return (jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1),
            jnp.concatenate(kpts, 1))


def best_person_keypoints(raw, input_size: int, strides=(8, 16, 32)):
    """Single best detection per image → [B, J, 3] with x/y normalized to
    the network input frame (the reference keeps only the first person,
    infer.py:200-226; 'first' under ultralytics NMS = highest confidence)."""
    _, scores, kpts = decode_pose(raw, strides)
    conf = scores.max(axis=-1)                       # [B, A]
    best = jnp.argmax(conf, axis=1)
    b = jnp.arange(conf.shape[0])
    sel = kpts[b, best]                              # [B, J, 3]
    return jnp.concatenate(
        [sel[..., :2] / input_size, sel[..., 2:]], axis=-1
    ), conf[b, best]


def nms_persons(boxes, scores, kpts, max_det: int = 10,
                conf_threshold: float = 0.25, iou_threshold: float = 0.45):
    """Greedy class-agnostic box NMS over decoded detections (static
    shapes, jit-safe). Returns (kpts [B,max_det,J,3], conf [B,max_det]);
    suppressed slots have conf 0. Mirrors ultralytics
    non_max_suppression's effect for nc=1 (ops.py) on a fixed budget."""
    B, A = scores.shape[0], scores.shape[1]
    conf = scores.max(axis=-1)
    K = min(max(4 * max_det, 32), A)
    top_c, idx = jax.lax.top_k(conf, K)
    bidx = jnp.arange(B)[:, None]
    bx = boxes[bidx, idx]                            # [B, K, 4] xywh
    kp = kpts[bidx, idx]

    half = bx[..., 2:] / 2
    mins = bx[..., :2] - half
    maxs = bx[..., :2] + half
    area = bx[..., 2] * bx[..., 3]

    def iou_row(i):
        mi = jax.lax.dynamic_slice_in_dim(mins, i, 1, axis=1)
        ma = jax.lax.dynamic_slice_in_dim(maxs, i, 1, axis=1)
        ai = jax.lax.dynamic_slice_in_dim(area, i, 1, axis=1)
        lo = jnp.maximum(mi, mins)
        hi = jnp.minimum(ma, maxs)
        inter = jnp.clip(hi - lo, 0).prod(-1)
        return inter / (ai + area - inter + 1e-9)

    def body(i, keep):
        iou = iou_row(i)                             # [B, K]
        later = jnp.arange(K)[None, :] > i
        ki = jax.lax.dynamic_slice_in_dim(keep, i, 1, axis=1)
        return keep & ~((iou > iou_threshold) & later & ki)

    keep = jnp.ones((B, K), bool)
    keep = jax.lax.fori_loop(0, K, body, keep)
    final = jnp.where(keep & (top_c >= conf_threshold), top_c, 0.0)
    sel_c, sel_i = jax.lax.top_k(final, max_det)
    return kp[bidx, sel_i], sel_c


def letterbox_params(h: int, w: int, size: int = 640):
    """ultralytics LetterBox: scale r = min(size/h, size/w), centered pad.
    Returns (r, new_w, new_h, pad_x, pad_y) with the upstream rounding
    (pad split half/half, round(±0.1))."""
    r = min(size / h, size / w)
    new_w, new_h = round(w * r), round(h * r)
    dw, dh = (size - new_w) / 2, (size - new_h) / 2
    left, top = round(dw - 0.1), round(dh - 0.1)
    return r, new_w, new_h, left, top
