"""Device-side (in-jit) pose augmentation: the host augmentor's transform
chain as one batched affine resample on the TPU.

The reference augments on the host with per-step PIL/cv2 warps
(src/dataset/augmentation.py:9-351); this repo's host parity port is
data/augment.py. On a production TPU host the train step runs at hundreds
of images/sec while a single host core augments tens — so augmentation,
not decode, becomes the host bottleneck once enabled. This module moves
the whole chain inside the jitted train step:

  * flip → rotate → scale → translate are composed into ONE forward
    affine per sample and applied with a single bilinear (image) /
    nearest (depth) gather — instead of the host's four sequential warps,
    each of which resamples (and degrades) the previous result;
  * brightness/contrast follow, per sample;
  * keypoints_2d / joints_3d are transformed with EXACTLY the host
    augmentor's formulas (including its conventions: flip maps
    normalized x -> 1-x while the image mirrors pixel x -> W-1-x; scale
    multiplies normalized keypoints by f while the image resample uses
    cv2.resize's half-pixel convention, both matching data/augment.py).

Geometry parity with the host path is exact for keypoints/joints and
sub-pixel for images (single-resample vs chained-resample; the image
comparison tests use interior-pixel tolerances). Randomness is per
sample per step (batched draws from the step rng) — independent of the
host augmentor's numpy stream, same distributions.

Matrix conventions: each stage is a forward pixel-space map p_dst = M p_src
(cv2.warpAffine semantics — cv2 inverts internally; so do we). The
composite M = T @ S @ R @ F is inverted analytically and the resample
evaluates src = M^-1 @ dst.

Performance (measured on the v5e dev chip, [100, 500, 500] fp32):
scattered-index sampling is pathological on TPU — ``map_coordinates``
costs ~1.3 s and per-element ``take_along_axis`` ~0.65 s per pass, while
shared-index column takes and one-hot matmuls both run at ~4.5 ms (the
bandwidth floor). So:

  * With rotation DISABLED the composite affine is axis-separable
    (diag + translate + flip, all per-sample-uniform) and the warp runs
    as TWO batched interpolation-matrix matmuls on the MXU
    (``_separable_warp``): exact bilinear/nearest, measured +5 ms on the
    359 ms full-config train step.
  * With rotation enabled the per-line (shear) offsets need true
    dynamic indexing; the warp runs as a TWO-PASS lane resample on the
    Mosaic dynamic-gather kernel (``_twopass_warp`` over
    ops/pallas/lane_resample — 5.4 ms per [50000, 500] fp32 pass, vs
    652 ms for XLA take_along_axis and 1.3 s for map_coordinates).
    The two-pass decomposition carries a sub-pixel shear approximation
    (tests/test_augment_device.py bounds it on smooth images).
  * ``resample="gather"`` keeps the exact single-pass
    ``map_coordinates`` path as the semantics oracle (slow on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.scipy import ndimage as jndi

from pose3d_tpu.core.config import SYMMETRIC_JOINTS_H36M


@dataclasses.dataclass(frozen=True)
class DeviceAugmentConfig:
    """Same knobs and defaults as data/augment.py PoseAugmentor (which
    mirrors the reference's config.py augmentation ranges)."""

    rotation_range: Tuple[float, float] = (-30.0, 30.0)
    flip_prob: float = 0.5
    scale_range: Tuple[float, float] = (0.8, 1.2)
    translate_range: Tuple[float, float] = (-0.1, 0.1)
    brightness_range: Tuple[float, float] = (0.8, 1.2)
    contrast_range: Tuple[float, float] = (0.8, 1.2)
    enable_rotation: bool = True
    enable_flip: bool = True
    enable_scale: bool = True
    enable_translate: bool = True
    enable_color: bool = True
    symmetric_joints: Sequence[Tuple[int, int]] = SYMMETRIC_JOINTS_H36M
    # Resample strategy: "auto" picks "separable" (two MXU interpolation
    # matmuls, exact) when rotation is off and "kernel" (two-pass Pallas
    # lane-resample, sub-pixel two-pass approximation) when rotation is
    # on; "gather" forces the exact-but-slow map_coordinates path
    # (reference semantics oracle, testing).
    resample: str = "auto"


def _affine_inverse(m):
    """Inverse of a batched 2x3 forward affine [[a,b,c],[d,e,f]]."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * e - b * d
    inv = jnp.stack(
        [
            jnp.stack([e, -b, b * f - c * e], -1),
            jnp.stack([-d, a, c * d - a * f], -1),
        ],
        -2,
    )
    return inv / det[..., None, None]


def _compose(m2, m1):
    """Forward composite applying m1 first, then m2 (both [..., 2, 3])."""
    r2, t2 = m2[..., :2], m2[..., 2]
    r1, t1 = m1[..., :2], m1[..., 2]
    return jnp.concatenate(
        [r2 @ r1, (jnp.einsum("...ij,...j->...i", r2, t1) + t2)[..., None]],
        axis=-1,
    )


def _warp_one(img, inv, h, w, order):
    """Sample one [H, W, C] image at the inverse-affine coordinates."""
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    coords = [src_y, src_x]
    return jnp.stack(
        [
            jndi.map_coordinates(
                img[..., ch], coords, order=order, mode="constant", cval=0.0
            )
            for ch in range(img.shape[-1])
        ],
        axis=-1,
    )


def _axis_weights(pos, n, order):
    """Interpolation matrix [B, N_in, N_out] for per-sample-uniform 1-D
    positions ``pos`` [B, N_out]: bilinear triangle weights (order 1) or
    floor(p+0.5) one-hot (order 0, matching map_coordinates' nearest).
    Out-of-range positions get vanishing column weight — identical to
    mode="constant", cval=0."""
    k = jnp.arange(n, dtype=jnp.float32)[None, :, None]  # [1, N_in, 1]
    p = pos[:, None, :]  # [B, 1, N_out]
    if order == 0:
        return (jnp.floor(p + 0.5) == k).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(p - k))


def _separable_warp(x, inv, order):
    """Axis-separable warp (inv has zero off-diagonal linear terms) as two
    batched interpolation-matrix contractions on the MXU — the TPU-native
    resample for the no-rotation configs (see module docstring perf
    notes). Exact tensor-product bilinear/nearest, fp32 accumulation."""
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    j = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[None, :]
    px = inv[:, 0, 0:1] * j + inv[:, 0, 2:3]  # [B, W_out]
    py = inv[:, 1, 1:2] * y + inv[:, 1, 2:3]  # [B, H_out]
    wx = _axis_weights(px, W, order)  # [B, W_in, W_out]
    wy = _axis_weights(py, H, order)  # [B, H_in, H_out]
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("bhwc,bwj->bhjc", x, wx, precision=hi)
    return jnp.einsum("bkjc,bky->byjc", t, wy, precision=hi)


def _twopass_warp(x, inv, order, interpret):
    """General affine warp as two Pallas lane-resample passes
    (ops/pallas/lane_resample): horizontal rows first, then vertical
    (on the transposed intermediate), the classic two-pass decomposition
    (Catmull-Smith). Exact along x; the vertical pass interpolates
    between rows whose horizontal positions differ by the shear slope,
    a sub-pixel approximation bounded by |i01/i11| pixels — negligible
    for the augmentor's ±30° range. Requires i11 != 0 (true for any
    rotation under ±90° composed with positive scale; flips only touch
    the x row of the matrix).

    Derivation: out[y,x] = I[y_src, x_src] with src = inv @ (x, y, 1).
    Pass 1 builds tmp[y, x] = I[y, q(x, y)], q = a*x + b*y + c with
    b = i01/i11, a = i00 - b*i10, c = i02 - b*i12; pass 2 samples
    out[y, x] = tmp[i10*x + i11*y + i12, x], so q evaluated at the
    pass-2 row equals x_src identically."""
    from pose3d_tpu.ops.pallas.lane_resample import lane_resample

    B, H, W, C = x.shape
    i00, i01, i02 = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    i10, i11, i12 = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    b = i01 / i11
    a = i00 - b * i10
    c = i02 - b * i12

    xc = jnp.moveaxis(x, -1, 1)  # [B, C, H, W]
    rows = xc.reshape(B * C * H, W)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :]
    o1 = b[:, None] * ys + c[:, None]                      # [B, H]
    a1 = jnp.broadcast_to(a[:, None, None], (B, C, H)).reshape(-1)
    o1 = jnp.broadcast_to(o1[:, None, :], (B, C, H)).reshape(-1)
    tmp = lane_resample(rows, a1, o1, order=order,
                        interpret=interpret).reshape(B, C, H, W)

    tt = tmp.swapaxes(2, 3)      # [B, C, W, H]
    rows2 = tt.reshape(B * C * W, H)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    o2 = i10[:, None] * xs + i12[:, None]                  # [B, W]
    a2 = jnp.broadcast_to(i11[:, None, None], (B, C, W)).reshape(-1)
    o2 = jnp.broadcast_to(o2[:, None, :], (B, C, W)).reshape(-1)
    out = lane_resample(rows2, a2, o2, order=order,
                        interpret=interpret).reshape(B, C, W, H)
    return jnp.moveaxis(out.swapaxes(2, 3), 1, -1)


def make_device_augment(cfg: DeviceAugmentConfig = DeviceAugmentConfig()):
    """Build ``augment(batch, key) -> batch`` operating on a decompacted
    device batch {image [B,H,W,3], depth [B,H,W,1], keypoints_2d [B,J,2],
    joints_3d [B,J,3]} inside jit. Extra keys pass through untouched."""

    sym = jnp.asarray([list(p) for p in cfg.symmetric_joints], jnp.int32)

    def augment(batch, key):
        img = batch["image"]
        depth = batch["depth"]
        kpts = batch["keypoints_2d"].astype(jnp.float32)
        joints = batch["joints_3d"].astype(jnp.float32)
        B, H, W = img.shape[0], img.shape[1], img.shape[2]
        wf, hf = float(W), float(H)
        kf, ka, ks, kt, kb, kc = jax.random.split(key, 6)

        def swap_pairs(x, do):
            swapped = x.at[:, sym[:, 0]].set(x[:, sym[:, 1]]).at[
                :, sym[:, 1]
            ].set(x[:, sym[:, 0]])
            return jnp.where(do[:, None, None], swapped, x)

        ident = jnp.broadcast_to(
            jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32),
            (B, 2, 3),
        )
        mat = ident
        scale_f = jnp.ones((B,), jnp.float32)
        trans = jnp.zeros((B, 2), jnp.float32)

        # -- flip (host: image mirror x -> W-1-x; kpts x -> 1-x; 3D x
        # negated; symmetric joints swapped — data/augment.py:74-86)
        if cfg.enable_flip:
            do = jax.random.bernoulli(kf, cfg.flip_prob, (B,))
            fm = jnp.where(do[:, None, None],
                           jnp.asarray([[-1.0, 0.0, wf - 1.0],
                                        [0.0, 1.0, 0.0]], jnp.float32),
                           ident)
            mat = _compose(fm, mat)
            kpts = jnp.where(
                do[:, None, None],
                jnp.stack([1.0 - kpts[..., 0], kpts[..., 1]], -1),
                kpts,
            )
            kpts = swap_pairs(kpts, do)
            joints = jnp.where(
                do[:, None, None],
                jnp.concatenate([-joints[..., :1], joints[..., 1:]], -1),
                joints,
            )
            joints = swap_pairs(joints, do)

        # -- rotation (host: cv2.getRotationMatrix2D about the center for
        # the image AND the pixel-space keypoints; 3D (x,y) plane rotates
        # with the pixels — data/augment.py:88-111)
        if cfg.enable_rotation:
            lo, hi = cfg.rotation_range
            ang = jax.random.uniform(
                ka, (B,), minval=lo, maxval=hi
            ) * (jnp.pi / 180.0)
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            cx, cy = wf / 2.0, hf / 2.0
            rm = jnp.stack(
                [
                    jnp.stack(
                        [ca, sa, (1 - ca) * cx - sa * cy], -1
                    ),
                    jnp.stack(
                        [-sa, ca, sa * cx + (1 - ca) * cy], -1
                    ),
                ],
                -2,
            )
            mat = _compose(rm, mat)
            px = jnp.stack(
                [kpts[..., 0] * wf, kpts[..., 1] * hf,
                 jnp.ones_like(kpts[..., 0])], -1
            )
            px = jnp.einsum("bij,bkj->bki", rm, px)
            kpts = jnp.stack([px[..., 0] / wf, px[..., 1] / hf], -1)
            r2 = jnp.stack(
                [jnp.stack([ca, sa], -1), jnp.stack([-sa, ca], -1)], -2
            )
            joints = jnp.concatenate(
                [jnp.einsum("bij,bkj->bki", r2, joints[..., :2]),
                 joints[..., 2:]],
                -1,
            )

        # -- scale (host: cv2.resize by f onto a static canvas anchored
        # top-left; kpts *= f — data/augment.py:113-137). The image factor
        # uses cv2.resize's half-pixel convention
        # (dst = f*src + 0.5f - 0.5), matching the host resample.
        if cfg.enable_scale:
            lo, hi = cfg.scale_range
            f = jax.random.uniform(ks, (B,), minval=lo, maxval=hi)
            off = 0.5 * f - 0.5
            zero = jnp.zeros_like(f)
            sm = jnp.stack(
                [
                    jnp.stack([f, zero, off], -1),
                    jnp.stack([zero, f, off], -1),
                ],
                -2,
            )
            mat = _compose(sm, mat)
            kpts = kpts * f[:, None, None]
            scale_f = f

        # -- translation (host: pixel shift; kpts += t/WH —
        # data/augment.py:139-150)
        if cfg.enable_translate:
            lo, hi = cfg.translate_range
            t = jax.random.uniform(kt, (B, 2), minval=lo, maxval=hi)
            tx, ty = t[:, 0] * wf, t[:, 1] * hf
            one = jnp.ones_like(tx)
            zero = jnp.zeros_like(tx)
            tm = jnp.stack(
                [
                    jnp.stack([one, zero, tx], -1),
                    jnp.stack([zero, one, ty], -1),
                ],
                -2,
            )
            mat = _compose(tm, mat)
            kpts = kpts + t[:, None, :]
            trans = jnp.stack([tx, ty], -1)

        geometric = (
            cfg.enable_flip or cfg.enable_rotation or cfg.enable_scale
            or cfg.enable_translate
        )
        if geometric:
            inv = _affine_inverse(mat)
            mode = cfg.resample
            if mode == "auto":
                mode = "separable" if not cfg.enable_rotation else "kernel"
            if mode == "separable":
                if cfg.enable_rotation:
                    raise ValueError(
                        "resample='separable' requires "
                        "enable_rotation=False"
                    )
                img = _separable_warp(img.astype(jnp.float32), inv, order=1)
                depth = _separable_warp(
                    depth.astype(jnp.float32), inv, order=0
                )
            elif mode == "kernel":
                interp = jax.default_backend() != "tpu"
                img = _twopass_warp(
                    img.astype(jnp.float32), inv, order=1, interpret=interp
                )
                depth = _twopass_warp(
                    depth.astype(jnp.float32), inv, order=0,
                    interpret=interp,
                )
            elif mode == "gather":
                img = jax.vmap(
                    lambda im, iv: _warp_one(
                        im.astype(jnp.float32), iv, H, W, order=1
                    )
                )(img, inv)
                depth = jax.vmap(
                    lambda im, iv: _warp_one(
                        im.astype(jnp.float32), iv, H, W, order=0
                    )
                )(depth, inv)
            else:
                raise ValueError(f"unknown resample mode {mode!r}")
            if cfg.enable_scale:
                # Host parity at the scale-crop seam: the host composites
                # the resized image onto the canvas as
                # canvas[:int(H*f), :int(W*f)] (data/augment.py:125-129),
                # zeroing everything beyond — while the composed affine
                # would keep a partial last row/column (bilinear tail into
                # the source edge). Mask the content box, shifted by any
                # later translation.
                # min(canvas, scaled) like the host's canvas[:ch, :cw] =
                # img_s[:ch, :cw]: for f>1 the content box is the CROPPED
                # canvas, so a later negative translation must expose
                # border zeros, not the cropped-away content the composed
                # affine would otherwise see through to.
                cw = jnp.minimum(jnp.floor(wf * scale_f), wf)[:, None, None]
                ch = jnp.minimum(jnp.floor(hf * scale_f), hf)[:, None, None]
                xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
                ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
                inside = (
                    (xs - trans[:, 0, None, None] < cw)
                    & (ys - trans[:, 1, None, None] < ch)
                )
                img = img * inside[..., None]
                depth = depth * inside[..., None]

        # -- color (host: brightness x*b then contrast about the grayscale
        # mean, torchvision semantics — data/augment.py:152-161)
        if cfg.enable_color:
            b = jax.random.uniform(
                kb, (B,), minval=cfg.brightness_range[0],
                maxval=cfg.brightness_range[1],
            )[:, None, None, None]
            c = jax.random.uniform(
                kc, (B,), minval=cfg.contrast_range[0],
                maxval=cfg.contrast_range[1],
            )[:, None, None, None]
            img = jnp.clip(img * b, 0.0, 1.0)
            gray = (
                0.2989 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2]
            ).mean(axis=(1, 2))[:, None, None, None]
            img = jnp.clip((img - gray) * c + gray, 0.0, 1.0)

        out = dict(batch)
        out["image"] = img.astype(batch["image"].dtype)
        out["depth"] = depth.astype(batch["depth"].dtype)
        out["keypoints_2d"] = kpts.astype(batch["keypoints_2d"].dtype)
        out["joints_3d"] = joints.astype(batch["joints_3d"].dtype)
        return out

    return augment
