"""Fused LayerNorm kernel vs flax nn.LayerNorm (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from pose3d_tpu.ops.pallas.layer_norm import layer_norm

rng = np.random.default_rng(0)


def _ref_apply(x, scale, bias, eps=1e-6):
    mod = nn.LayerNorm(epsilon=eps, dtype=x.dtype)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("shape", [(8, 100, 768), (3, 640), (513, 256)])
def test_forward_matches_flax(shape):
    C = shape[-1]
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    got = np.asarray(layer_norm(x, scale, bias, 1e-6, True))
    want = np.asarray(_ref_apply(x, scale, bias))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grads_match_flax():
    shape, C = (4, 70, 256), 256
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def loss_pal(x, s, b):
        return (layer_norm(x, s, b, 1e-6, True) * w).sum()

    def loss_ref(x, s, b):
        return (_ref_apply(x, s, b) * w).sum()

    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gp, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5,
            err_msg=name,
        )


def test_bf16_inputs():
    x = jnp.asarray(rng.normal(size=(130, 256)), jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    y = layer_norm(x, scale, bias, 1e-6, True)
    assert y.dtype == jnp.bfloat16
    want = np.asarray(_ref_apply(x.astype(jnp.float32), scale, bias))
    np.testing.assert_allclose(np.asarray(y, np.float32), want,
                               rtol=2e-2, atol=2e-2)
