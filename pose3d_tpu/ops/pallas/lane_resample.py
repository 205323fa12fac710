"""Pallas lane-axis 1-D resample: rows sampled at affine positions.

The device augmentor's rotation path needs per-line 1-D resampling —
``out[n, j] = row_n[a_n * j + o_n]`` with bilinear or nearest
interpolation and constant-0 out-of-range. XLA has no fast form for it
on TPU: per-element ``take_along_axis`` on the minor axis measures
652 ms per [50000, 500] fp32 pass and ``map_coordinates`` 1.3 s
(scattered gathers serialize). This kernel runs the same pass in
**5.4 ms** — at the platform's ~3.7 ms elementwise floor — by using
Mosaic's vector ``dynamic_gather`` within 128-lane register blocks.

Mosaic lane-gather constraints discovered on hardware (and encoded
here):
  * the gathered (lane) axis of the SOURCE must live in a single
    128-lane vreg — "Multiple source vregs along gather dimension"
    otherwise;
  * indices must have the same shape as the source;
  * gathers along sublanes crash the TPU compiler outright.
So both the output row and the source row are tiled into 128-lane
blocks and the kernel accumulates over (output-block, source-block)
pairs with range masks — W/128 ≈ 4 blocks each way for 500-pixel rows,
i.e. 16 masked vector gathers per tap, all VPU-vectorized.

Semantics match jax.scipy.ndimage.map_coordinates exactly: order=1 is
two-tap linear with partial edge weights (positions in (-1, 0) blend
toward the constant 0), order=0 is floor(p + 0.5) nearest.
Validated in tests/test_augment_device.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128


def _kernel(x_ref, a_ref, o_ref, out_ref, *, w_in, wp, order):
    x = x_ref[...]                      # [R, Wp]
    a = a_ref[...]                      # [R, 1]
    o = o_ref[...]                      # [R, 1]
    rows = x.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1).astype(
        jnp.float32
    )
    p = a * j + o

    def gather_blocks(fi):
        """out[r, j] = x[r, fi[r, j]] for in-range fi, else 0."""
        nblk = wp // _LANES
        out_blocks = []
        for ob in range(nblk):
            fib = fi[:, ob * _LANES:(ob + 1) * _LANES]
            acc = jnp.zeros((rows, _LANES), x.dtype)
            for sb in range(nblk):
                base = sb * _LANES
                src = x[:, base:base + _LANES]
                loc = jnp.clip(fib - base, 0, _LANES - 1)
                g = jnp.take_along_axis(src, loc, axis=1)
                hit = (
                    (fib >= base) & (fib < base + _LANES)
                ).astype(x.dtype)
                acc = acc + g * hit
            out_blocks.append(acc)
        return jnp.concatenate(out_blocks, axis=1)

    if order == 0:
        f = jnp.floor(p + 0.5)
        fi = jnp.clip(f, 0, w_in - 1).astype(jnp.int32)
        v = gather_blocks(fi)
        valid = ((f >= 0) & (f <= w_in - 1)).astype(x.dtype)
        out_ref[...] = v * valid
    else:
        f = jnp.floor(p)
        w = (p - f).astype(x.dtype)
        f0 = jnp.clip(f, 0, w_in - 1).astype(jnp.int32)
        f1 = jnp.clip(f + 1, 0, w_in - 1).astype(jnp.int32)
        v0 = gather_blocks(f0)
        v1 = gather_blocks(f1)
        m0 = ((f >= 0) & (f <= w_in - 1)).astype(x.dtype)
        m1 = ((f + 1 >= 0) & (f + 1 <= w_in - 1)).astype(x.dtype)
        out_ref[...] = v0 * m0 * (1.0 - w) + v1 * m1 * w


def lane_resample(x, a, o, order: int = 1, block_rows: int = 256,
                  interpret: bool = False):
    """Resample every row of ``x`` [N, W] at positions a[n]*j + o[n]
    (j = 0..W-1), order 1 (bilinear) or 0 (nearest), constant-0 outside
    [0, W-1]. Returns [N, W]."""
    n, w = x.shape
    wp = -(-w // _LANES) * _LANES
    if wp != w:
        x = jnp.pad(x, ((0, 0), (0, wp - w)))
    np_ = -(-n // block_rows) * block_rows
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
        a = jnp.pad(a, (0, np_ - n))
        o = jnp.pad(o, (0, np_ - n))
    out = pl.pallas_call(
        functools.partial(_kernel, w_in=w, wp=wp, order=order),
        grid=(np_ // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, wp), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, wp), x.dtype),
        interpret=interpret,
    )(x, a[:, None], o[:, None])
    return out[:n, :w]
