"""Fused MLP-core kernel vs the unfused reference (interpret mode, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose3d_tpu.ops.pallas.mlp_block import fused_mlp

rng = np.random.default_rng(0)


def _ref(x, w1, b1, w2, b2):
    a = x.astype(jnp.float32) @ w1 + b1
    ga = jax.nn.gelu(a, approximate=False)
    return (ga @ w2 + b2).astype(x.dtype)


def _mk(N, D, H, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(N, D)), dtype)
    w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.05, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("N,D,H", [(300, 128, 512), (256, 256, 1024)])
def test_forward_matches_reference(N, D, H):
    x, w1, b1, w2, b2 = _mk(N, D, H)
    got = np.asarray(fused_mlp(x, w1, b1, w2, b2, True))
    want = np.asarray(_ref(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_3d_input():
    x, w1, b1, w2, b2 = _mk(260, 128, 512)
    x3 = x.reshape(2, 130, 128)
    got = np.asarray(fused_mlp(x3, w1, b1, w2, b2, True))
    want = np.asarray(_ref(x, w1, b1, w2, b2)).reshape(2, 130, 128)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grads_match_reference():
    x, w1, b1, w2, b2 = _mk(300, 128, 512)
    w = jnp.asarray(rng.normal(size=(300, 128)), jnp.float32)

    def loss_pal(x, w1, b1, w2, b2):
        return (fused_mlp(x, w1, b1, w2, b2, True) * w).sum()

    def loss_ref(x, w1, b1, w2, b2):
        return (_ref(x, w1, b1, w2, b2) * w).sum()

    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b_, name in zip(gp, gr, ("dx", "dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4,
            err_msg=name,
        )


def test_bf16_forward():
    x, w1, b1, w2, b2 = _mk(256, 128, 512, jnp.bfloat16)
    got = np.asarray(fused_mlp(x, w1, b1, w2, b2, True), np.float32)
    want = np.asarray(
        _ref(x.astype(jnp.float32), w1, b1, w2, b2), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_grads_respect_param_dtypes():
    """db2 must come back in b2's dtype even when it differs from b1's
    (round-3 review: copy-paste used b1.dtype)."""
    x, w1, b1, w2, _ = _mk(256, 128, 512)
    b2 = jnp.asarray(rng.normal(size=(128,)) * 0.05, jnp.bfloat16)

    def loss(x, w1, b1, w2, b2):
        return fused_mlp(x, w1, b1, w2, b2, True).astype(jnp.float32).sum()

    g = jax.grad(loss, argnums=(2, 4))(x, w1, b1, w2, b2)
    assert g[0].dtype == jnp.float32   # db1
    assert g[1].dtype == jnp.bfloat16  # db2
