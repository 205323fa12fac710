"""Shared Pallas helpers: row-tile padding and VMEM block specs used by
the row-streaming kernels (layer_norm, mlp_block)."""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_rows(x2, block_rows: int):
    """Zero-pad [N, C] up to a multiple of ``block_rows``; returns
    (padded, padded_rows). Zero rows are inert for all kernels here
    (sums/means are taken per row or masked by zero gradients)."""
    n = x2.shape[0]
    np_ = -(-n // block_rows) * block_rows
    if np_ != n:
        x2 = jnp.pad(x2, ((0, np_ - n), (0, 0)))
    return x2, np_


def row_spec(block_rows: int, C: int) -> pl.BlockSpec:
    """[BR, C] VMEM block marching down the row axis with the grid."""
    return pl.BlockSpec(
        (block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


def const_spec(shape) -> pl.BlockSpec:
    """Constant-index VMEM block: fetched once and kept resident across
    grid steps (weights, accumulators)."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)
