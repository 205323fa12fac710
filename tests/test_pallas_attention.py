"""Pallas fused-attention kernel vs. the XLA einsum reference (interpret
mode on CPU; compiled path exercised on TPU by bench/integration)."""

import numpy as np
import pytest

from pose3d_tpu.ops.attention import dot_product_attention
from pose3d_tpu.ops.pallas.flash_attention import flash_attention

rng = np.random.default_rng(0)


@pytest.mark.parametrize("shape", [
    (2, 128, 2, 64),   # aligned
    (1, 100, 4, 64),   # seq padding path
    (2, 1041, 1, 48),  # the model's real final-encoder shape
])
def test_matches_xla_reference(shape):
    B, T, H, D = shape
    q = rng.normal(size=shape).astype(np.float32)
    k = rng.normal(size=shape).astype(np.float32)
    v = rng.normal(size=shape).astype(np.float32)
    expected = np.asarray(dot_product_attention(q, k, v, backend="xla"))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_softmax_normalization():
    """Uniform V ⇒ output equals V regardless of scores."""
    B, T, H, D = 1, 64, 1, 64
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = np.ones((B, T, H, D), np.float32) * 3.5
    out = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, 3.5, rtol=1e-5)


def test_bf16_inputs():
    import jax.numpy as jnp

    q = jnp.asarray(rng.normal(size=(1, 130, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 130, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 130, 2, 64)), jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    expected = dot_product_attention(q, k, v, backend="xla")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32),
        rtol=5e-2, atol=5e-2,
    )
