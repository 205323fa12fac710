"""Fused transformer-MLP core (Pallas/TPU): Dense → exact GELU → Dense in
one kernel, weights VMEM-resident across row tiles.

Motivation (docs/ROUND3.md): the development chip sustains only
~33-52 GB/s effective HBM bandwidth, so the ViT train step is dominated by
activation traffic — the worst single item being the [N, 4·D] MLP hidden
activation (≈50 MB at the backbone's [8·1025, 3072] bf16), written by fc1
and re-read by fc2, plus re-read again by the backward. This kernel keeps
the hidden activation entirely in VMEM per row tile:

  forward  traffic: x (once) + W1,W2 (once — constant-index blocks stay
           resident across grid steps) + out (once)   ≈ 35 MB/block
  vs XLA:  x + W1 + hidden(write+read) + W2 + out     ≈ 130 MB/block

The backward recomputes the hidden activation from the saved input
(flash-style), accumulates dW1/dW2/db1/db2 into revisited fp32 VMEM
blocks across row tiles, and emits dx per tile — again never touching
HBM with an [N, 4·D] tensor.

GELU is the exact erf variant (ops/activations.py: torch nn.GELU default);
its derivative is Φ(a) + a·φ(a) with Φ the normal CDF and φ the pdf.

NOT wired into any model: the measured result on the development chip
(docs/ROUND3.md) is a tie with XLA's own pipeline, so this stays a
tested, self-contained op awaiting hardware where the traffic saving
pays; a future integration would thread a switch through
``models.transformer.Mlp`` (dropout-free paths only).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose3d_tpu.ops.pallas.util import (
    const_spec as _const_spec,
    pad_rows as _pad_rows,
    row_spec as _row_spec,
)

_BLOCK_ROWS = 256
_SQRT_HALF = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(z):
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7): Mosaic has
    no erf lowering, and 1.5e-7 is far below bf16 activation noise."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu(a):
    return a * 0.5 * (1.0 + _erf(a * _SQRT_HALF))


def _gelu_grad(a):
    cdf = 0.5 * (1.0 + _erf(a * _SQRT_HALF))
    pdf = jnp.exp(-0.5 * a * a) * _INV_SQRT_2PI
    return cdf + a * pdf


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]                                          # [BR, D] bf16
    a = jax.lax.dot_general(
        x, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)                     # [BR, H] fp32
    ga = _gelu(a).astype(x.dtype)
    out = jax.lax.dot_general(
        ga, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)                     # [BR, D] fp32
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]                                          # [BR, D]
    g = g_ref[...]                                          # [BR, D]
    # recompute the hidden activation (never stored to HBM)
    a = jax.lax.dot_general(
        x, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)                     # [BR, H] fp32
    ga = _gelu(a).astype(x.dtype)

    dga = jax.lax.dot_general(                              # g @ W2ᵀ
        g, w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [BR, H] fp32
    da = (dga * _gelu_grad(a)).astype(x.dtype)              # [BR, H]

    dx = jax.lax.dot_general(                               # da @ W1ᵀ
        da, w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    dw1_ref[...] += jax.lax.dot_general(                    # xᵀ @ da
        x, da, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[...] += jnp.sum(
        da.astype(jnp.float32), axis=0, keepdims=True
    )
    dw2_ref[...] += jax.lax.dot_general(                    # gaᵀ @ g
        ga, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(
        g.astype(jnp.float32), axis=0, keepdims=True
    )


def _vmem_params(D, H, BR):
    # weights + fp32 grads-accumulators + fp32 row tiles, with headroom
    need = (
        2 * D * H * 2            # w1, w2 bf16
        + 2 * D * H * 4          # dw1, dw2 fp32 accumulators (bwd)
        + 4 * BR * H * 4         # a/ga/dga/da tiles fp32-ish
        + 4 * BR * D * 4
    ) + 8 * 1024 * 1024
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(120 * 1024 * 1024, max(need, 32 * 1024 * 1024))
    )


def _fwd_impl(x, w1, b1, w2, b2, interpret):
    shape = x.shape
    D = shape[-1]
    H = w1.shape[-1]
    x2 = x.reshape(-1, D)
    n = x2.shape[0]
    x2, np_ = _pad_rows(x2, _BLOCK_ROWS)
    grid = (np_ // _BLOCK_ROWS,)
    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, D), x.dtype),
        grid=grid,
        in_specs=[
            _row_spec(_BLOCK_ROWS, D),
            _const_spec((D, H)), _const_spec((1, H)),
            _const_spec((H, D)), _const_spec((1, D)),
        ],
        out_specs=_row_spec(_BLOCK_ROWS, D),
        compiler_params=_vmem_params(D, H, _BLOCK_ROWS),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * D * H,
            bytes_accessed=(2 * np_ * D + 2 * D * H) * 2,
            transcendentals=np_ * H,
        ),
    )(x2, w1c, b1.reshape(1, H), w2c, b2.reshape(1, D))
    return out[:n].reshape(shape)


def _bwd_impl(x, w1, b1, w2, b2_dtype, g, interpret):
    shape = x.shape
    D = shape[-1]
    H = w1.shape[-1]
    x2, np_ = _pad_rows(x.reshape(-1, D), _BLOCK_ROWS)
    g2, _ = _pad_rows(g.reshape(-1, D), _BLOCK_ROWS)
    n = x.reshape(-1, D).shape[0]
    grid = (np_ // _BLOCK_ROWS,)
    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((np_, D), x.dtype),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(_BLOCK_ROWS, D),
            _const_spec((D, H)), _const_spec((1, H)),
            _const_spec((H, D)),
            _row_spec(_BLOCK_ROWS, D),
        ],
        out_specs=(
            _row_spec(_BLOCK_ROWS, D),
            _const_spec((D, H)), _const_spec((1, H)),
            _const_spec((H, D)), _const_spec((1, D)),
        ),
        compiler_params=_vmem_params(D, H, _BLOCK_ROWS),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * np_ * D * H,
            bytes_accessed=(3 * np_ * D + 4 * D * H) * 2,
            transcendentals=2 * np_ * H,
        ),
    )(x2, w1c, b1.reshape(1, H), w2c, g2)
    # padded rows: x=0, g=0 ⇒ zero contributions everywhere
    return (
        dx[:n].reshape(shape),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2_dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, interpret: bool = False):
    """``gelu_exact(x @ w1 + b1) @ w2 + b2`` over the last axis of x.

    One fused kernel; the [N, H] hidden activation never reaches HBM.
    Output dtype = x.dtype; weights are cast to x.dtype for the MXU
    (the same promotion flax Dense applies), grads returned in the
    weights' own dtype.
    """
    return _fwd_impl(x, w1, b1, w2, b2, interpret)


def _fused_fwd(x, w1, b1, w2, b2, interpret):
    out = _fwd_impl(x, w1, b1, w2, b2, interpret)
    # b2 rides along only for its dtype (residuals must be JAX types)
    return out, (x, w1, b1, w2, b2)


def _fused_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    dx, dw1, db1, dw2, db2 = _bwd_impl(x, w1, b1, w2, b2.dtype, g, interpret)
    return dx, dw1, db1, dw2, db2


fused_mlp.defvjp(_fused_fwd, _fused_bwd)
