"""Fused row-wise LayerNorm (Pallas/TPU) — candidate replacement for the
ViT's nn.LayerNorm hot path.

Motivation (docs/ROUND3.md corrected profile): the ViT b8 train step
spends 14.3 ms/step in convert+reduce fusions — XLA's minor-dim reduces
run far below HBM bandwidth (the same codegen weakness as the closed BN
investigation, CLAUDE.md). Unlike BN (whose statistics reduce over the
batch/spatial axes — the layout-hostile direction), LayerNorm reduces
along the MINOR axis of a [rows, C] view: each (8, 128) tile row is
reduced in-register, so a fused kernel reads x exactly once per pass.

Forward: one pass computes fp32 row statistics AND the normalized output
(x is VMEM-resident per block). Row (mean, rstd) are written as [rows, 1]
residuals. Backward: standard LN gradient
  dx = rstd * (g∘s − mean_row(g∘s) − x̂ ∘ mean_row(g∘s ∘ x̂))
with per-block partial (dscale, dbias) accumulated across row blocks by a
tiny XLA sum outside the kernel.

NOT wired into any model: measured at the same bandwidth wall as flax
LayerNorm on the development chip (docs/ROUND3.md), so it stays a
tested, self-contained op awaiting hardware where the fused pass wins
(the BN lesson — a kernel boundary can cost more than the reduce it
saves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose3d_tpu.ops.pallas.util import (
    pad_rows as _pad_rows,
    row_spec as _row_spec,
)

_BLOCK_ROWS = 512


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, mu_ref, rstd_ref,
                *, eps: float):
    x = x_ref[...].astype(jnp.float32)                     # [BR, C]
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    xhat = (x - mu) * rstd
    y = xhat * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rstd_ref[...] = rstd


def _bwd_kernel(x_ref, scale_ref, mu_ref, rstd_ref, g_ref,
                dx_ref, dscale_ref, dbias_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)                     # [BR, C]
    mu = mu_ref[...]
    rstd = rstd_ref[...]
    xhat = (x - mu) * rstd
    gs = g * scale_ref[...].astype(jnp.float32)
    m1 = jnp.mean(gs, axis=1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=1, keepdims=True)
    dx = rstd * (gs - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # per-block partials over the row axis; final [C] sum happens outside
    dscale_ref[0, 0, :] = jnp.sum(g * xhat, axis=0)
    dbias_ref[0, 0, :] = jnp.sum(g, axis=0)


def _stat_spec(BR):
    return pl.BlockSpec((BR, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _param_spec(C):
    return pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM)


def _fwd_impl(x, scale, bias, eps, interpret):
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    n = x2.shape[0]
    x2, np_ = _pad_rows(x2, _BLOCK_ROWS)
    grid = (np_ // _BLOCK_ROWS,)
    y, mu, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((np_, C), x.dtype),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[_row_spec(_BLOCK_ROWS, C), _param_spec(C), _param_spec(C)],
        out_specs=(_row_spec(_BLOCK_ROWS, C), _stat_spec(_BLOCK_ROWS),
                   _stat_spec(_BLOCK_ROWS)),
        interpret=interpret,
    )(x2, scale, bias)
    return y[:n].reshape(shape), (mu, rstd, np_)


def _bwd_impl(x, scale, mu, rstd, g, np_, interpret):
    shape = x.shape
    C = shape[-1]
    x2, _ = _pad_rows(x.reshape(-1, C), _BLOCK_ROWS)
    g2, _ = _pad_rows(g.reshape(-1, C), _BLOCK_ROWS)
    n = x.reshape(-1, C).shape[0]
    grid = (np_ // _BLOCK_ROWS,)
    nb = grid[0]
    # partials are [nb, 1, C] so the (1, 1, C) block's trailing two dims
    # equal/divide the array dims (Mosaic tiling rule — same trap as the
    # attention kernel's LSE output)
    dx, dscale_p, dbias_p = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((np_, C), x.dtype),
            jax.ShapeDtypeStruct((nb, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, C), jnp.float32),
        ),
        grid=grid,
        in_specs=[_row_spec(_BLOCK_ROWS, C), _param_spec(C),
                  _stat_spec(_BLOCK_ROWS), _stat_spec(_BLOCK_ROWS),
                  _row_spec(_BLOCK_ROWS, C)],
        out_specs=(_row_spec(_BLOCK_ROWS, C),
                   pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x2, scale, mu, rstd, g2)
    # Padded rows: x=0, mu/rstd from padded stats, g=0 ⇒ gs=0 ⇒ dx=0 and
    # zero partial contributions, so the tails are inert.
    return (
        dx[:n].reshape(shape),
        dscale_p.sum(axis=(0, 1)).astype(scale.dtype),
        dbias_p.sum(axis=(0, 1)).astype(scale.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, scale, bias, eps: float = 1e-6, interpret: bool = False):
    """Fused LayerNorm over the last axis of ``x`` (any leading shape).

    fp32 statistics, input-dtype output — semantics of
    ``nn.LayerNorm(epsilon=eps)`` with params (scale, bias) of shape [C].
    """
    y, _ = _fwd_impl(x, scale, bias, eps, interpret)
    return y


def _ln_fwd(x, scale, bias, eps, interpret):
    y, (mu, rstd, np_) = _fwd_impl(x, scale, bias, eps, interpret)
    return y, (x, scale, mu, rstd, np_)


def _ln_bwd(eps, interpret, res, g):
    x, scale, mu, rstd, np_ = res
    dx, dscale, dbias = _bwd_impl(x, scale, mu, rstd, g, np_, interpret)
    return dx, dscale, dbias


layer_norm.defvjp(_ln_fwd, _ln_bwd)
