"""Grouped (ghost) BatchNorm statistics via flax method interception.

Motivation (round 3 profile, docs/ROUND3.md): the ghost accumulation mode
vmaps the whole model over the accumulation axis, and the vmap costs
~25-30 ms/step of copies/reshapes on the 500px CNN step versus the flat
batch-100 program (380 vs ~347 ms device). The grouped formulation runs
the model ONCE on the flat [A*B] batch — the exact program of the fast
100x1 configuration — and restores the reference's 10x10 BatchNorm
semantics (src/train.py:83-121 accumulates 10 microbatches whose BN
statistics each cover 10 samples) *inside* the BatchNorm call: statistics
per group of B samples, normalization per group, and the A-fold
sequential running-stat EMA chain applied in closed form.

Implementation: rather than threading a ``groups`` attribute through
every block (ConvBnAct, InvertedResidual, DualPath, WASP, and
CoordAttention's hard-coded ``nn.BatchNorm`` — models/cnn.py:329), the
grouped train step applies the unmodified model under
``nn.intercept_methods`` with the interceptor below, which swaps every
``nn.BatchNorm.__call__`` in training mode for the per-group computation.
Numerics reuse flax's own ``_compute_stats`` / ``_normalize`` helpers, so
each group's statistics and normalization are bit-identical to what an
``nn.BatchNorm`` would compute on that group alone; equivalence with the
sequential scan path is asserted by tests/test_ghost_accum.py.

The closed-form EMA chain: the sequential path folds group statistics
s_0..s_{A-1} into the running value as r_{i+1} = m*r_i + (1-m)*s_i, which
telescopes to

    r_A = m^A * r_0 + sum_i m^(A-1-i) * (1-m) * s_i.

Dropout note: grouped mode leaves dropout untouched — one mask over the
flat batch instead of per-group masks from fold_in(rng, i). Bernoulli
masks are iid per element either way, so training dynamics are identical
in distribution, but bitwise mask equality with the scan path only holds
with dropout disabled (the reference's torch dropout masks were never
bit-matched either).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen import module as fmodule
from flax.linen import normalization as fnorm


def ema_chain(r0, increments, momentum):
    """Closed form of the A-fold sequential EMA chain
    r_{i+1} = m*r_i + inc_i, telescoped:

        r_A = m^A * r_0 + sum_i m^(A-1-i) * inc_i.

    ``increments`` is stacked [A, ...]. The grouped interceptor passes
    inc_i = (1-m)*s_i (raw per-group statistics); the vmapped ghost step
    passes inc_i = g_i - m*r_0 (recovered from the per-group *updated*
    stats g_i = m*r_0 + (1-m)*s_i that vmapped BatchNorm returns). Both
    are the same chain — one shared source of truth for the formula."""
    g = increments.shape[0]
    w = (momentum ** jnp.arange(g - 1, -1, -1)).astype(r0.dtype)
    wr = w.reshape((g,) + (1,) * r0.ndim)
    return (momentum ** g) * r0 + (increments * wr).sum(axis=0)


def ghost_batchnorm_interceptor(groups: int, group_major: bool = True):
    """Build an ``nn.intercept_methods`` interceptor computing BatchNorm
    statistics per group of ``batch_size // groups`` samples.

    Only ``nn.BatchNorm`` instances in training mode (use_running_average
    False) are rewritten; every other module method passes through. The
    custom DotStatsBatchNorm / Pallas BN variants are rejected loudly —
    silently computing their statistics over the whole flat batch would
    change training semantics.

    ``group_major`` declares the flat batch's sample order: True means
    sample ``g*B + b`` belongs to group ``g`` (the single-device layout);
    False means sample ``b*G + g`` belongs to group ``g`` — the
    *group-minor* layout the mesh-sharded grouped train step uses so that
    the [A, B-sharded] → [A·B] merge stays a local transpose + contiguous
    reshape under GSPMD (see train/step.py grouped_step). Group membership
    (microbatch i = group i) is identical either way; only the in-memory
    order differs.
    """

    def interceptor(next_fun, args, kwargs, context):
        mdl = context.module
        if context.method_name != "__call__" or groups == 1:
            return next_fun(*args, **kwargs)
        if type(mdl) is not nn.BatchNorm:
            # Refuse the custom BN variants instead of mis-grouping them.
            from pose3d_tpu.models.cnn import DotStatsBatchNorm

            if isinstance(mdl, DotStatsBatchNorm) and not (
                mdl.use_running_average or mdl.is_initializing()
            ):
                raise NotImplementedError(
                    "accum_mode='grouped' supports normalization='batch' "
                    "(flax nn.BatchNorm) only; use accum_mode='ghost' with "
                    f"{type(mdl).__name__}"
                )
            return next_fun(*args, **kwargs)
        if mdl.is_initializing():
            return next_fun(*args, **kwargs)
        use_running_average = fmodule.merge_param(
            "use_running_average",
            mdl.use_running_average,
            kwargs.get(
                "use_running_average", args[1] if len(args) > 1 else None
            ),
        )
        if use_running_average:
            return next_fun(*args, **kwargs)
        if kwargs.get("mask") is not None:
            return next_fun(*args, **kwargs)

        x = args[0]
        n = x.shape[0]
        if n % groups:
            raise ValueError(
                f"grouped BatchNorm: batch {n} not divisible by "
                f"{groups} groups"
            )
        feature_axes = fnorm._canonicalize_axes(x.ndim, mdl.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes
        )
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = (
            jnp.float32
            if mdl.force_float32_reductions
            else mdl.param_dtype
        )
        ra_mean = mdl.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, stats_dtype), feature_shape,
        )
        ra_var = mdl.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, stats_dtype), feature_shape,
        )

        # Ungroup the flat batch. group_major: [G, B, ...] with the group
        # axis leading (single-device layout — group i is the i-th
        # sequential microbatch). group-minor: [B, G, ...] with the group
        # axis second, so a batch axis sharded over the mesh stays the
        # leading (contiguously sharded) axis and each group's statistics
        # reduce lowers to a local reduce + one [G, C]-sized all-reduce
        # instead of a full-batch regather.
        if group_major:
            xg = x.reshape((groups, n // groups) + x.shape[1:])
            gax = 0
        else:
            xg = x.reshape((n // groups, groups) + x.shape[1:])
            gax = 1
        means, vars_ = jax.vmap(
            lambda xi: fnorm._compute_stats(
                xi,
                reduction_axes,
                dtype=mdl.dtype,
                use_fast_variance=mdl.use_fast_variance,
                force_float32_reductions=mdl.force_float32_reductions,
            ),
            in_axes=gax,
        )(xg)

        m = mdl.momentum
        ra_mean.value = ema_chain(ra_mean.value, (1 - m) * means, m)
        ra_var.value = ema_chain(ra_var.value, (1 - m) * vars_, m)

        y = jax.vmap(
            lambda xi, mi, vi: fnorm._normalize(
                mdl, xi, mi, vi, reduction_axes, feature_axes,
                mdl.dtype, mdl.param_dtype, mdl.epsilon,
                mdl.use_bias, mdl.use_scale,
                mdl.bias_init, mdl.scale_init,
                mdl.force_float32_reductions,
            ),
            in_axes=(gax, 0, 0),
            out_axes=gax,
        )(xg, means, vars_)
        return y.reshape(x.shape)

    return interceptor
