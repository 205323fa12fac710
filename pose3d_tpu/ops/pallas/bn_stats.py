"""Pallas per-channel moment kernel for BatchNorm statistics.

Motivation (round-1 profile, CLAUDE.md perf notes): in the full 500×500
CNN, XLA lays conv activations out batch-minor and its channel-wise reduce
kernels over that layout run at ~65 GB/s (≈5× below HBM speed); BatchNorm
statistics cost ~22% of the train-step wall (357 vs 279 ms/step identity
control at B=100). An MXU rank-1-contraction formulation crashes the TPU
compiler at full scale (models/cnn.py DotStatsBatchNorm history).

This kernel computes Σx and Σx² per channel in ONE pass over the
activation: a 1-D grid walks row tiles of the [n, C] view, each step doing
a VPU partial reduce in VMEM into an [8, C] accumulator (TPU grid steps
execute sequentially per core, so accumulation across steps is safe). The
x² pass rides the same tile read — half the HBM traffic of XLA's two
separate reduces even before the layout win.

Backward is closed-form elementwise (∂Σx/∂x = 1, ∂Σx²/∂x = 2x), wired via
custom_vjp — no Pallas needed on the way back; XLA fuses it into the
surrounding BN-normalize gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024  # rows per grid step (multiple of 8; [TILE, C] ≤ 2 MB @ C=512)


def _stats_kernel(x_ref, s1_ref, s2_ref, *, n: int, tile: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    x = x_ref[...].astype(jnp.float32)               # [tile, C]
    # mask the ragged final tile (OOB rows read unspecified data)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * tile
    x = jnp.where(row < n, x, 0.0)
    xr = x.reshape(tile // 8, 8, x.shape[-1])
    s1_ref[...] += jnp.sum(xr, axis=0)               # [8, C]
    s2_ref[...] += jnp.sum(xr * xr, axis=0)


def _stats_impl(x2d, interpret: bool):
    n, C = x2d.shape
    tile = min(_TILE, max(8, (n // 8) * 8)) if n < _TILE else _TILE
    grid = pl.cdiv(n, tile)
    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, n=n, tile=tile),
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((8, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, C), jnp.float32),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * n * C,
            bytes_accessed=n * C * x2d.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2d)
    return s1.sum(axis=0), s2.sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def bn_stats(x2d, interpret: bool = False):
    """Per-channel (Σx, Σx²) of a [n, C] array, fp32, in one fused pass."""
    return _stats_impl(x2d, interpret)


def _bn_stats_fwd(x2d, interpret):
    return _stats_impl(x2d, interpret), (x2d,)


def _bn_stats_bwd(interpret, residuals, g):
    (x2d,) = residuals
    g1, g2 = g
    dx = g1[None, :] + 2.0 * x2d.astype(jnp.float32) * g2[None, :]
    return (dx.astype(x2d.dtype),)


bn_stats.defvjp(_bn_stats_fwd, _bn_stats_bwd)
