"""Fused attention kernel (Pallas/TPU) for the lifting transformer's fixed
short sequences.

Shape analysis (SURVEY.md §5): the model's longest attention is over 1,041
tokens (1 CLS + 1024 image + 16 heatmap patches) with head_dim 48-64. At
these sizes one (batch, head) attention instance fits entirely in VMEM
(seq padded to 1152: Q/K/V ≈ 3×1152×64×2 B ≈ 0.4 MB, scores 1152² fp32 ≈
5.3 MB < 16 MB), so no online-softmax tiling is needed: the kernel fuses
QKᵀ → masked softmax → PV in a single VMEM-resident program per (b, h) —
the [T, T] score matrix never touches HBM, which is the entire win over
the unfused path at these shapes.

Falls back are handled by the caller (pose3d_tpu.ops.attention)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    # refs: [1, T, 1, D] blocks for one (batch, head).
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    T = q.shape[0]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                               # [T, T] fp32

    if valid_len < T:
        col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)

    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, 0, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q, k, v, interpret: bool = False):
    """Fused attention over [B, T, H, D] tensors (heads on axis 2).

    Pads T up to a multiple of 128 (masked) and runs one fused
    VMEM-resident attention per (batch, head). Returns [B, T, H, D] in the
    input dtype; softmax in fp32.
    """
    B, T, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    Tp = -(-T // 128) * 128
    if Tp != T:
        pad = [(0, 0), (0, Tp - T), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    spec = pl.BlockSpec(
        (1, Tp, 1, D), lambda b, h: (b, 0, h, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, valid_len=T),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H, D), q.dtype),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Tp * Tp * D,
            bytes_accessed=4 * B * H * Tp * D * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
    )(q, k, v)
    return out[:, :T]
