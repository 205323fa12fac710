"""DotStatsBatchNorm (MXU-path statistics) vs flax BatchNorm parity."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.models.cnn import DotStatsBatchNorm

rng = np.random.default_rng(0)


def _pair(x):
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32)
    fast = DotStatsBatchNorm(use_running_average=False, dtype=jnp.float32)
    rv = ref.init(jax.random.PRNGKey(0), x)
    fv = fast.init(jax.random.PRNGKey(0), x)
    ro, rmut = ref.apply(rv, x, mutable=["batch_stats"])
    fo, fmut = fast.apply(fv, x, mutable=["batch_stats"])
    return (ro, rmut), (fo, fmut)


def test_train_mode_matches_flax():
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(8, 6, 6, 16)), jnp.float32)
    (ro, rmut), (fo, fmut) = _pair(x)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(ro), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fmut["batch_stats"]["mean"]),
        np.asarray(rmut["batch_stats"]["mean"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(fmut["batch_stats"]["var"]),
        np.asarray(rmut["batch_stats"]["var"]), rtol=1e-5,
    )


def test_eval_mode_uses_running_stats():
    x = jnp.asarray(rng.normal(size=(4, 5, 5, 8)), jnp.float32)
    m = DotStatsBatchNorm(use_running_average=True, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # with zero-mean/unit-var running stats and identity affine,
    # eval-mode output ≈ input
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_gradients_flow():
    x = jnp.asarray(rng.normal(size=(4, 4, 4, 8)), jnp.float32)
    m = DotStatsBatchNorm(use_running_average=False, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        return (out ** 2).mean()

    gp = jax.grad(loss)(v["params"], x)
    gx = jax.grad(loss, argnums=1)(v["params"], x)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves((gp, gx)))
    assert float(jnp.abs(gx).sum()) > 0


def test_cnn_with_batch_dot_runs():
    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model
    from pose3d_tpu.models.factory import dummy_inputs

    cfg = CNNModelConfig(
        image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
        stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
        initial_channels=8, global_pool_size=2, global_feature_dim=16,
        regression_dims=(16,), normalization="batch_dot",
    )
    model, variables = init_model(cfg, batch_size=2)
    out, muts = model.apply(
        variables, *dummy_inputs(cfg, 2), train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
    )
    assert out.shape == (2, 17, 3)
    assert "batch_stats" in muts


def test_pallas_stats_match_flax():
    """batch_pallas: the fused Σx/Σx² kernel (interpret mode on CPU) must
    reproduce flax BatchNorm outputs, running stats, and input/param
    gradients."""
    x = jnp.asarray(rng.normal(1.5, 2.5, size=(6, 7, 5, 24)), jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32)
    fast = DotStatsBatchNorm(use_running_average=False, dtype=jnp.float32,
                             stats="pallas")
    rv = ref.init(jax.random.PRNGKey(0), x)
    fv = fast.init(jax.random.PRNGKey(0), x)
    ro, rmut = ref.apply(rv, x, mutable=["batch_stats"])
    fo, fmut = fast.apply(fv, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(fo), np.asarray(ro), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fmut["batch_stats"]["mean"]),
        np.asarray(rmut["batch_stats"]["mean"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(fmut["batch_stats"]["var"]),
        np.asarray(rmut["batch_stats"]["var"]), rtol=1e-5,
    )

    def loss(mod, variables, x):
        out, _ = mod.apply(variables, x, mutable=["batch_stats"])
        return (out ** 3).mean()  # asymmetric: exercises mean/var grads

    gr = jax.grad(loss, argnums=2)(ref, rv, x)
    gf = jax.grad(loss, argnums=2)(fast, fv, x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_pallas_stats_ragged_rows():
    """n not divisible by the kernel tile (masked tail path)."""
    from pose3d_tpu.ops.pallas.bn_stats import bn_stats

    x = rng.normal(size=(1234, 16)).astype(np.float32)
    s1, s2 = bn_stats(jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(s1), x.sum(0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (x * x).sum(0),
                               rtol=1e-4, atol=1e-3)


def test_pallas_threshold_fallback():
    """batch_pallas:min_n — below-threshold layers use plain XLA reduces,
    same numerics."""
    x = jnp.asarray(rng.normal(0.5, 1.2, size=(4, 6, 6, 8)), jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32)
    fb = DotStatsBatchNorm(use_running_average=False, dtype=jnp.float32,
                           stats="pallas", pallas_min_pixels=10 ** 9)
    rv = ref.init(jax.random.PRNGKey(0), x)
    fv = fb.init(jax.random.PRNGKey(0), x)
    ro, rmut = ref.apply(rv, x, mutable=["batch_stats"])
    fo, fmut = fb.apply(fv, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(fo), np.asarray(ro), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fmut["batch_stats"]["var"]),
        np.asarray(rmut["batch_stats"]["var"]), rtol=1e-5,
    )
