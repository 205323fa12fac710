"""Native JAX stage-1 models: 2D keypoint detection + monocular depth.

The reference shells out to two external pretrained torch models per image —
ultralytics YOLO11x-pose for 17 COCO keypoints (preprocess.py:28,63;
infer.py:138,162) and HF DepthPro for metric depth (preprocess.py:30-31;
infer.py:142-149). This module supplies TPU-native equivalents with the
same output contracts, built for batched jit execution:

  * :class:`KeypointNet` — anchor-free single-person pose estimator in the
    YOLO-pose family: CSP-style conv backbone (SiLU ConvBN + bottleneck
    CSP blocks + SPPF), FPN top-down neck, and a center+keypoint head that
    predicts an objectness heatmap and per-cell keypoint offsets; decoding
    picks the best center cell (single-person assumption matches the
    reference, which keeps only the first detected person —
    infer.py:200-226) and emits [17, 3] (norm_x, norm_y, conf).
  * :class:`DepthNet` — DPT-style monocular depth: the same backbone,
    multi-scale feature fusion decoder, per-pixel inverse-depth head with
    a learned scale to metric depth (DepthPro-class capability).

Pretrained torch checkpoints can be ported with
:func:`pose3d_tpu.stage1.port` helpers when available; without them the
models run with their own (trainable) weights — the full pipeline,
container formats and CLIs are exercisable end-to-end either way.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("pose3d_tpu.stage1.models")


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features, 3, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class CSPBlock(nn.Module):
    """Cross-stage-partial block (C2f/C3k2 family)."""

    features: int
    depth: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        y = ConvBN(self.features, 1, dtype=self.dtype)(x, train)
        a, b = y[..., :half], y[..., half:]
        outs = [a, b]
        for _ in range(self.depth):
            b = Bottleneck(half, dtype=self.dtype)(b, train)
            outs.append(b)
        return ConvBN(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 stacked 5×5 max-pools."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        x = ConvBN(half, 1, dtype=self.dtype)(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (5, 5), strides=(1, 1), padding="SAME"
                )
            )
        return ConvBN(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(pools, axis=-1), train
        )


class CSPBackbone(nn.Module):
    """Strided CSP backbone emitting P3 (/8), P4 (/16), P5 (/32) features."""

    widths: Sequence[int] = (32, 64, 128, 256, 512)
    depths: Sequence[int] = (1, 2, 2, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.widths
        x = ConvBN(w[0], 3, 2, dtype=self.dtype)(x, train)      # /2
        x = ConvBN(w[1], 3, 2, dtype=self.dtype)(x, train)      # /4
        x = CSPBlock(w[1], self.depths[0], dtype=self.dtype)(x, train)
        x = ConvBN(w[2], 3, 2, dtype=self.dtype)(x, train)      # /8
        p3 = CSPBlock(w[2], self.depths[1], dtype=self.dtype)(x, train)
        x = ConvBN(w[3], 3, 2, dtype=self.dtype)(p3, train)     # /16
        p4 = CSPBlock(w[3], self.depths[2], dtype=self.dtype)(x, train)
        x = ConvBN(w[4], 3, 2, dtype=self.dtype)(p4, train)     # /32
        x = CSPBlock(w[4], self.depths[3], dtype=self.dtype)(x, train)
        p5 = SPPF(w[4], dtype=self.dtype)(x, train)
        return p3, p4, p5


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")


class KeypointNet(nn.Module):
    """2D keypoint detector (YOLO-pose-class), multi-scale and
    multi-person capable.

    Input:  [B, H, W, 3] float images in [0, 1] (square).
    Output of __call__: per-scale raw heads
      [(obj [B,h,w], kpt [B,h,w,J,3]) for strides 8, 16, 32]
    plus decoded best-person keypoints [B, J, 3] (norm_x, norm_y, conf) —
    the single-person contract matching the reference's first-person
    selection (infer.py:200-226). Multi-person decoding with greedy
    center NMS lives in :func:`decode_persons`.
    """

    num_joints: int = 17
    widths: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = False):
        B, H, W, _ = images.shape
        p3, p4, p5 = CSPBackbone(self.widths, dtype=self.dtype)(
            images.astype(self.dtype), train
        )
        # FPN top-down (P5→P4→P3); heads at all three scales.
        w = self.widths
        t4 = CSPBlock(w[3], 1, dtype=self.dtype)(
            jnp.concatenate([_upsample2(ConvBN(w[3], 1, dtype=self.dtype)(
                p5, train)), p4], axis=-1),
            train,
        )
        t3 = CSPBlock(w[2], 1, dtype=self.dtype)(
            jnp.concatenate([_upsample2(ConvBN(w[2], 1, dtype=self.dtype)(
                t4, train)), p3], axis=-1),
            train,
        )

        heads = []
        for feat, width in ((t3, w[2]), (t4, w[3]), (p5, w[4])):
            h = ConvBN(width, 3, dtype=self.dtype)(feat, train)
            obj = nn.Conv(1, (1, 1), dtype=jnp.float32)(h)[..., 0]
            kpt = nn.Conv(self.num_joints * 3, (1, 1), dtype=jnp.float32)(h)
            hs, ws = kpt.shape[1], kpt.shape[2]
            heads.append(
                (obj, kpt.reshape(B, hs, ws, self.num_joints, 3))
            )

        kpts = decode_best_person(heads)
        return kpts, heads


def _flatten_heads(heads):
    """Per-scale heads → (obj [B, N], centers [B, N, 2] normalized,
    kpts [B, N, J, 3] decoded to normalized coords + conf logits)."""
    objs, centers, kpts = [], [], []
    for obj, kpt in heads:
        B, hs, ws = obj.shape
        cy = (jnp.arange(hs, dtype=jnp.float32) + 0.5) / hs
        cx = (jnp.arange(ws, dtype=jnp.float32) + 0.5) / ws
        cc = jnp.stack(jnp.meshgrid(cx, cy, indexing="xy"), axis=-1)  # [h,w,2]
        px = (cc[..., 0][None, :, :, None] + kpt[..., 0] / ws)
        py = (cc[..., 1][None, :, :, None] + kpt[..., 1] / hs)
        k = jnp.stack([px, py, kpt[..., 2]], axis=-1)  # [B,h,w,J,3]
        objs.append(obj.reshape(B, -1))
        centers.append(jnp.broadcast_to(cc[None], (B, hs, ws, 2))
                       .reshape(B, -1, 2))
        kpts.append(k.reshape(B, hs * ws, -1, 3))
    return (jnp.concatenate(objs, 1), jnp.concatenate(centers, 1),
            jnp.concatenate(kpts, 1))


def decode_best_person(heads):
    """Highest-objectness cell across all scales → [B, J, 3]."""
    obj, _, kpts = _flatten_heads(heads)
    best = jnp.argmax(obj, axis=1)
    b = jnp.arange(obj.shape[0])
    sel = kpts[b, best]                                # [B, J, 3]
    conf_obj = jax.nn.sigmoid(jnp.max(obj, axis=1))    # [B]
    conf = jax.nn.sigmoid(sel[..., 2]) * conf_obj[:, None]
    return jnp.stack(
        [sel[..., 0], sel[..., 1], conf], axis=-1
    ).astype(jnp.float32)


def decode_persons(heads, max_persons: int = 5,
                   conf_threshold: float = 0.25,
                   nms_radius: float = 0.1):
    """Multi-person decode: top-k objectness cells across scales with
    greedy center NMS (static shapes — jit-safe).

    Returns (persons [B, max_persons, J, 3], person_conf [B, max_persons]);
    suppressed/below-threshold slots have conf 0."""
    obj, centers, kpts = _flatten_heads(heads)
    B = obj.shape[0]
    K = max_persons * 4  # candidate pool before NMS
    scores, idx = jax.lax.top_k(obj, K)                  # [B, K]
    bidx = jnp.arange(B)[:, None]
    cand_c = centers[bidx, idx]                          # [B, K, 2]
    cand_k = kpts[bidx, idx]                             # [B, K, J, 3]
    cand_s = jax.nn.sigmoid(scores)                      # [B, K]

    # Greedy NMS over the K candidates (in descending score order).
    def body(i, keep):
        ci = jax.lax.dynamic_slice_in_dim(cand_c, i, 1, axis=1)  # [B,1,2]
        d = jnp.linalg.norm(cand_c - ci, axis=-1)                # [B,K]
        later = jnp.arange(K)[None, :] > i
        ki = jax.lax.dynamic_slice_in_dim(keep, i, 1, axis=1)    # [B,1]
        clash = (d < nms_radius) & later & ki
        return keep & ~clash

    keep = jnp.ones((B, K), bool)
    keep = jax.lax.fori_loop(0, K, body, keep)
    final_s = jnp.where(keep & (cand_s >= conf_threshold), cand_s, 0.0)

    # take the max_persons best surviving candidates
    top_s, top_i = jax.lax.top_k(final_s, max_persons)   # [B, P]
    sel_k = cand_k[bidx, top_i]                          # [B, P, J, 3]
    conf = jax.nn.sigmoid(sel_k[..., 2]) * top_s[..., None]
    persons = jnp.stack(
        [sel_k[..., 0], sel_k[..., 1], conf], axis=-1
    ).astype(jnp.float32)
    return persons, top_s.astype(jnp.float32)


class DepthNet(nn.Module):
    """Monocular metric depth (DPT-style decoder over the CSP backbone;
    DepthPro-class capability).

    Input:  [B, H, W, 3] float images in [0, 1].
    Output: [B, H, W] metric depth (softplus-positive, learned scale).
    """

    widths: Sequence[int] = (32, 64, 128, 256, 512)
    fusion_dim: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = False):
        B, H, W, _ = images.shape
        p3, p4, p5 = CSPBackbone(self.widths, dtype=self.dtype)(
            images.astype(self.dtype), train
        )
        f = self.fusion_dim
        # Reassemble: project each scale to fusion_dim and fuse top-down.
        x = ConvBN(f, 1, dtype=self.dtype)(p5, train)
        x = _upsample2(x)
        x = x + ConvBN(f, 1, dtype=self.dtype)(p4, train)
        x = CSPBlock(f, 1, dtype=self.dtype)(x, train)
        x = _upsample2(x)
        x = x + ConvBN(f, 1, dtype=self.dtype)(p3, train)
        x = CSPBlock(f, 1, dtype=self.dtype)(x, train)
        # /8 → full resolution
        x = _upsample2(x)                                          # /4
        x = ConvBN(f // 2, 3, dtype=self.dtype)(x, train)
        x = _upsample2(x)                                          # /2
        x = ConvBN(f // 4, 3, dtype=self.dtype)(x, train)
        x = _upsample2(x)                                          # /1
        inv = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32)(x)[..., 0]
        # inverse depth → metric with a learned positive scale/shift
        scale = self.param("depth_scale", nn.initializers.ones, ())
        shift = self.param("depth_shift", nn.initializers.zeros, ())
        inv_depth = jax.nn.softplus(inv) * jax.nn.softplus(scale) + 1e-3
        return (1.0 / inv_depth + jax.nn.softplus(shift)).astype(jnp.float32)


class NativeKeypointBackend:
    """KeypointNet over square-resized inputs (trainable native family)."""

    def __init__(self, num_joints: int, input_size: int, params=None,
                 rng=None, mesh=None):
        self.num_joints = num_joints
        self.input_size = input_size
        self.model = KeypointNet(num_joints=num_joints)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        # jitted init: eager init compiles per-op — brutally slow on this
        # host (CLAUDE.md; models/factory.py does the same)
        self.variables = params or jax.jit(
            lambda r, d: self.model.init(r, d, train=False)
        )(rng, dummy)
        self.variables = _commit_variables(self.variables, mesh)

        def fwd(v, x):
            return self.model.apply(v, x, train=False)[0]

        self._fwd = (_data_parallel_jit(fwd, mesh) if mesh is not None
                     else jax.jit(fwd))
        self._pad_multiple = mesh.devices.size if mesh is not None else 1

    def predict(self, images: Sequence[np.ndarray]) -> np.ndarray:
        batch = _pad_rows(_square_resize_batch(images, self.input_size),
                          self._pad_multiple)
        return np.asarray(self._fwd(self.variables, batch))[: len(images)]


def _data_parallel_jit(fwd, mesh):
    """jit ``fwd(variables, batch)`` with the batch sharded over the mesh
    ``data`` axis (replicated params; stage-1 inference is embarrassingly
    data-parallel — the multi-chip path for the 1M-image preprocess
    sweep, SURVEY.md §3.3 bottleneck)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pose3d_tpu.core.mesh import batch_spec_entry

    repl = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(batch_spec_entry(mesh)))
    return jax.jit(fwd, in_shardings=(repl, sharded))


def _commit_variables(variables, mesh):
    """Commit checkpoint variables to device ONCE at construction. Left
    as host numpy, jit would re-upload every leaf on every predict —
    ~0.6-1 s per array through the remote-TPU tunnel for the 500-900
    tensors of a ported checkpoint (CLAUDE.md: always bulk)."""
    from pose3d_tpu.core.transfer import bulk_device_put

    if mesh is None:
        return bulk_device_put(variables)
    from jax.sharding import NamedSharding, PartitionSpec as P

    # one bulk host→device transfer, then device-side replication to
    # match _data_parallel_jit's pinned replicated in_sharding
    staged = bulk_device_put(variables, device=mesh.devices.flat[0])
    return jax.device_put(staged, NamedSharding(mesh, P()))


class YoloKeypointBackend:
    """Ported ultralytics YOLO11-pose: letterbox → jitted forward+decode →
    best person → un-letterbox to original normalized coords (the full
    contract of reference infer.py:156-237 with pretrained weights)."""

    def __init__(self, weights, input_size: int = 640,
                 box_conf_threshold: float = 0.25, dtype=None, mesh=None):
        from pose3d_tpu.stage1.yolo_port import load_yolo11_pose

        self.input_size = input_size
        self.box_conf_threshold = box_conf_threshold
        self.model, self.variables = load_yolo11_pose(weights, dtype=dtype)
        self.variables = _commit_variables(self.variables, mesh)
        self.num_joints = self.model.kpt_shape[0]

        from pose3d_tpu.stage1.yolo11 import best_person_keypoints

        def fwd(v, x):
            raw = self.model.apply(v, x, train=False)
            kp, conf = best_person_keypoints(raw, input_size)
            if kp.shape[-1] == 2:
                # kpt_shape (J, 2) checkpoints carry no per-keypoint
                # confidence — emit conf 1.0 so the (x, y, conf) output
                # contract holds (yolo_port accepts such checkpoints;
                # without this they crashed at predict time)
                kp = jnp.concatenate(
                    [kp, jnp.ones_like(kp[..., :1])], axis=-1
                )
            return kp, conf

        self._fwd = (_data_parallel_jit(fwd, mesh) if mesh is not None
                     else jax.jit(fwd))
        self._pad_multiple = mesh.devices.size if mesh is not None else 1

    def predict(self, images: Sequence[np.ndarray]) -> np.ndarray:
        import cv2

        from pose3d_tpu.stage1.yolo11 import letterbox_params

        s = self.input_size
        m = self._pad_multiple
        n_rows = -(-len(images) // m) * m  # pad to the mesh data axis
        batch = np.full((n_rows, s, s, 3), 114 / 255.0, np.float32)
        geoms = []
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            r, nw, nh, left, top = letterbox_params(h, w, s)
            resized = cv2.resize(im, (nw, nh),
                                 interpolation=cv2.INTER_LINEAR)
            if resized.dtype == np.uint8:
                resized = resized.astype(np.float32) / 255.0
            batch[i, top:top + nh, left:left + nw] = resized
            geoms.append((r, left, top, w, h))
        kp, conf = self._fwd(self.variables, batch)
        kp, conf = np.asarray(kp).copy(), np.asarray(conf)
        out = np.zeros((len(images), self.num_joints, 3), np.float32)
        for i, (r, left, top, w, h) in enumerate(geoms):
            if conf[i] < self.box_conf_threshold:
                continue  # no person detected → zeros (reference contract)
            x = (kp[i, :, 0] * s - left) / r / w
            y = (kp[i, :, 1] * s - top) / r / h
            out[i] = np.stack(
                [np.clip(x, 0, 1), np.clip(y, 0, 1), kp[i, :, 2]], axis=-1
            )
        return out


class NativeDepthBackend:
    """DepthNet over square-resized inputs (trainable native family)."""

    def __init__(self, input_size: int, params=None, rng=None, mesh=None):
        self.input_size = input_size
        self.model = DepthNet()
        rng = rng if rng is not None else jax.random.PRNGKey(1)
        dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        self.variables = params or jax.jit(
            lambda r, d: self.model.init(r, d, train=False)
        )(rng, dummy)
        self.variables = _commit_variables(self.variables, mesh)

        def fwd(v, x):
            return self.model.apply(v, x, train=False)

        self._fwd = (_data_parallel_jit(fwd, mesh) if mesh is not None
                     else jax.jit(fwd))
        self._pad_multiple = mesh.devices.size if mesh is not None else 1

    def predict(self, images: Sequence[np.ndarray]):
        import cv2

        batch = _pad_rows(_square_resize_batch(images, self.input_size),
                          self._pad_multiple)
        depths = np.asarray(self._fwd(self.variables, batch))[: len(images)]
        out = []
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            out.append(cv2.resize(depths[i], (w, h),
                                  interpolation=cv2.INTER_LINEAR))
        return out


class DepthProBackend:
    """Ported Apple DepthPro: 1536² resize + normalize → jitted multi-scale
    ViT forward → FOV-calibrated metric depth at original resolution
    (reference infer.py:240-252, preprocess.py:71-81)."""

    def __init__(self, weights, input_size: int = 1536,
                 max_batch: int = 2, dtype=None, mesh=None):
        from pose3d_tpu.stage1.depthpro_port import load_depth_pro

        self.input_size = input_size
        if mesh is not None:
            # every call pads to max_batch, so align it with the mesh
            n_dev = mesh.devices.size
            max_batch = max(max_batch, n_dev)
            max_batch -= max_batch % n_dev
        self.max_batch = max_batch
        self.model, self.variables = load_depth_pro(
            weights, dtype=dtype, image_size=input_size
        )
        self.variables = _commit_variables(self.variables, mesh)

        def fwd(v, x):
            from pose3d_tpu.stage1.depthpro import fov_scaled_inverse_depth

            depth, fov = self.model.apply(v, x)
            # FOV-calibrated INVERSE depth; inversion happens after the
            # host resize to original resolution, matching HF's
            # interpolate-then-invert post-processing order.
            return fov_scaled_inverse_depth(depth, fov)

        self._fwd = (_data_parallel_jit(fwd, mesh) if mesh is not None
                     else jax.jit(fwd))

    def predict(self, images: Sequence[np.ndarray]):
        import cv2

        s = self.input_size
        canonical = []
        for i in range(0, len(images), self.max_batch):
            chunk = images[i:i + self.max_batch]
            batch = np.stack([
                cv2.resize(im, (s, s), interpolation=cv2.INTER_LINEAR)
                for im in chunk
            ])
            if batch.dtype == np.uint8:
                batch = batch.astype(np.float32) / 255.0
            batch = (batch.astype(np.float32) - 0.5) / 0.5
            # pad to max_batch so every call hits the same compiled program
            n = len(chunk)
            if n < self.max_batch:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], self.max_batch - n, 0)]
                )
            out = np.asarray(self._fwd(self.variables, batch))[:n]
            canonical.extend(out)
        results = []
        for im, d in zip(images, canonical):
            h, w = im.shape[:2]
            d = cv2.resize(d, (w, h), interpolation=cv2.INTER_LINEAR)
            results.append(1.0 / np.clip(d, 1e-4, 1e4))
        return results


def _pad_rows(batch: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the batch dim up to a multiple (mesh data-axis width) by
    repeating the last row."""
    if multiple <= 1 or len(batch) % multiple == 0:
        return batch
    pad = multiple - len(batch) % multiple
    return np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])


def _square_resize_batch(images: Sequence[np.ndarray], size: int
                         ) -> np.ndarray:
    import cv2

    out = np.stack([
        cv2.resize(im, (size, size), interpolation=cv2.INTER_LINEAR)
        for im in images
    ])
    if out.dtype == np.uint8:
        out = out.astype(np.float32) / 255.0
    return out.astype(np.float32)


class JaxStage1:
    """Batched, jitted stage-1 provider (the TPU replacement for per-image
    YOLO + DepthPro torch calls; SURVEY.md §3.2 'no batching anywhere' is
    the anti-pattern). Backends:

      * ``kp_weights``  → :class:`YoloKeypointBackend` (ported YOLO11-pose)
      * ``depth_weights`` → :class:`DepthProBackend` (ported DepthPro)
      * otherwise the trainable native :class:`KeypointNet`/:class:`DepthNet`.
    """

    def __init__(
        self,
        num_joints: int = 17,
        input_size: int = 512,
        keypoint_params=None,
        depth_params=None,
        rng: Optional[jax.Array] = None,
        confidence_threshold: float = 0.0,
        kp_weights=None,
        depth_weights=None,
        kp_input_size: int = 640,
        depth_input_size: int = 1536,
        depth_max_batch: int = 2,
        dtype=None,
        mesh=None,
    ):
        self.num_joints = num_joints
        self.input_size = input_size
        # Keypoints below this confidence are zeroed (conf=0 marks them
        # invalid downstream — the heatmap validity mask drops them). The
        # reference ACCEPTS a --yolo_confidence_threshold flag but never
        # applies it (infer.py:156-237, SURVEY.md §2 quirk); here it works.
        self.confidence_threshold = confidence_threshold
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if kp_weights:
            self._kp = YoloKeypointBackend(
                kp_weights, input_size=kp_input_size, dtype=dtype,
                mesh=mesh,
            )
            if self._kp.num_joints != num_joints:
                logger.warning(
                    "keypoint weights predict %d joints, pipeline expects %d",
                    self._kp.num_joints, num_joints,
                )
        else:
            self._kp = NativeKeypointBackend(
                num_joints, input_size, params=keypoint_params, rng=rng,
                mesh=mesh,
            )
        if depth_weights:
            # depth_max_batch: DepthPro's device micro-batch (HBM bound at
            # 1536²). A batched predict() call is internally chunked to
            # this size, so CLI batches that are a multiple of it run with
            # zero padding waste.
            self._depth = DepthProBackend(
                depth_weights, input_size=depth_input_size,
                max_batch=depth_max_batch, dtype=dtype, mesh=mesh,
            )
        else:
            self._depth = NativeDepthBackend(
                input_size, params=depth_params,
                rng=jax.random.fold_in(rng, 1), mesh=mesh,
            )

    # introspection helpers (native backends only), used by tests and the
    # training path for the native stage-1 family
    @property
    def kp_model(self):
        return self._kp.model

    @property
    def kp_vars(self):
        return self._kp.variables

    @property
    def depth_model(self):
        return self._depth.model

    @property
    def depth_vars(self):
        return self._depth.variables

    def predict_batch(self, images: Sequence[np.ndarray]):
        """images: list of [H, W, 3] uint8/float RGB. Returns a list of
        Stage1Result with keypoints [J,3] and per-image metric depth at
        original resolution."""
        from pose3d_tpu.stage1.api import Stage1Result

        kpts = self._kp.predict(images)[:, : self.num_joints]
        if kpts.shape[1] < self.num_joints:  # pad (reference infer.py:214)
            pad = np.zeros(
                (len(images), self.num_joints - kpts.shape[1], 3),
                np.float32,
            )
            kpts = np.concatenate([kpts, pad], axis=1)
        if self.confidence_threshold > 0:
            kpts = kpts.copy()
            kpts[kpts[..., 2] < self.confidence_threshold] = 0.0
        depths = self._depth.predict(images)
        results = []
        for i in range(len(images)):
            d = depths[i].astype(np.float32)
            results.append(
                Stage1Result(
                    keypoints=kpts[i].astype(np.float32),
                    depth=d,
                    depth_min=float(d.min()),
                    depth_max=float(d.max()),
                )
            )
        return results

    # api used by the infer CLI
    def predict_one(self, image_path, image: Optional[np.ndarray] = None):
        if image is None:
            import cv2

            bgr = cv2.imread(str(image_path), cv2.IMREAD_COLOR)
            if bgr is None:
                return None
            image = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        return self.predict_batch([image])[0]

    def predict(self, image_paths, images=None):
        if images is not None:
            return self.predict_batch(images)
        return [self.predict_one(p) for p in image_paths]
