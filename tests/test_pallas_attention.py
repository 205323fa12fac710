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


def test_backward_matches_xla():
    """Custom-VJP gradients vs autodiff through the einsum reference."""
    import jax
    import jax.numpy as jnp

    B, T, H, D = 1, 100, 2, 64
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)

    def loss_ref(q, k, v):
        return (dot_product_attention(q, k, v, backend="xla") ** 2).sum()

    def loss_pallas(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pal, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_cross_attention_matches_xla():
    """Different q/kv lengths (the cross-modal fusion shapes: 1024 img
    queries attending over 16 heatmap tokens and vice versa)."""
    for tq, tk in [(1024, 16), (16, 1024), (100, 40)]:
        q = rng.normal(size=(1, tq, 2, 32)).astype(np.float32)
        k = rng.normal(size=(1, tk, 2, 32)).astype(np.float32)
        v = rng.normal(size=(1, tk, 2, 32)).astype(np.float32)
        expected = np.asarray(dot_product_attention(q, k, v, backend="xla"))
        got = np.asarray(flash_attention(q, k, v, interpret=True))
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_cross_attention_grads():
    import jax

    q = rng.normal(size=(1, 24, 2, 32)).astype(np.float32)
    k = rng.normal(size=(1, 72, 2, 32)).astype(np.float32)
    v = rng.normal(size=(1, 72, 2, 32)).astype(np.float32)
    gr = jax.grad(
        lambda q, k, v: (dot_product_attention(q, k, v) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gp = jax.grad(
        lambda q, k, v: (flash_attention(q, k, v, interpret=True) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_flash_attention_tensor_parallel():
    """The kernel must compose with a (data, model) mesh — batch sharded
    over "data", heads over "model" (the Megatron layout of parallel/tp.py)
    — via its custom_partitioning rules, for forward AND gradients."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pose3d_tpu.core.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh((2, 4), ("data", "model"))
    B, T, H, D = 4, 64, 8, 32
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = rng.normal(size=(B, T, H, D)).astype(np.float32)
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))

    def loss(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)),
                in_shardings=(sh, sh, sh))
    got, grads = f(qd, kd, vd)

    def ref_loss(q, k, v):
        return (dot_product_attention(q, k, v, backend="xla") ** 2).sum()

    want, ref_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)
    for g, rg in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(rg), rtol=2e-3, atol=2e-3
        )


def test_value_depth_differs_from_qk():
    """YOLO PSA shape: key_dim = head_dim/2, so v is deeper than q/k."""
    import jax

    q = rng.normal(size=(2, 400, 4, 32)).astype(np.float32)
    k = rng.normal(size=(2, 400, 4, 32)).astype(np.float32)
    v = rng.normal(size=(2, 400, 4, 64)).astype(np.float32)
    expected = np.asarray(dot_product_attention(q, k, v, backend="xla"))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)

    gr = jax.grad(
        lambda q, k, v: (dot_product_attention(q, k, v) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gp = jax.grad(
        lambda q, k, v: (flash_attention(q, k, v, interpret=True) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")
