"""Ghost-BN superbatch accumulation ≡ sequential scan accumulation.

The ghost path (train/step.py accum_mode="ghost") must reproduce the
sequential scan path (accum_mode="scan", the literal analogue of the
reference's accumulation loop, src/train.py:83-121) exactly:

  * identical gradients (asserted through identical post-SGD params;
    the comparison runs the model in fp32 so only reduction-order noise
    separates the two differently-fused XLA programs),
  * identical BatchNorm running stats, including the A-fold sequential
    EMA chain (here verified against the scan's literal chain),
  * identical dropout masks (same fold_in(rng, i) per group — the test
    keeps the config's dropout ON),
  * identical logged loss components.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pose3d_tpu.core.config import CNNModelConfig
from pose3d_tpu.models import init_model
from pose3d_tpu.train import create_train_state
from pose3d_tpu.train.step import make_train_step

TINY = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),  # keeps default regression_dropout=0.2 ON
)


def _batch(rng, a, b):
    return {
        "image": rng.uniform(size=(a, b, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(a, b, 32, 32, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(a, b, 17, 2)).astype(
            np.float32
        ),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    # fp32 compute: the two paths compile to different fusions, so bf16
    # activations would add rounding noise unrelated to the math being
    # verified; fp32 keeps the comparison tight.
    model, variables = init_model(TINY, batch_size=4, dtype=jnp.float32)
    # plain SGD so the param delta IS the (scaled) gradient — no adaptive
    # rescaling hiding or amplifying differences
    tx = optax.sgd(1e-2)
    state = create_train_state(model, variables, tx=tx)
    return model, state


def _tree_allclose(a, b, rtol, atol, what):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la, dtype=np.float64),
            np.asarray(lb, dtype=np.float64),
            rtol=rtol, atol=atol,
            err_msg=f"{what}: {jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize("accum", [1, 3])
def test_ghost_matches_scan(setup, accum):
    model, state = setup
    rng = np.random.default_rng(42 + accum)
    batch = _batch(rng, accum, 4)
    key = jax.random.PRNGKey(7)

    scan_step = make_train_step(model, donate=False, accum_mode="scan")
    ghost_step = make_train_step(model, donate=False, accum_mode="ghost")

    s_scan, m_scan = jax.device_get(scan_step(state, batch, key))
    s_ghost, m_ghost = jax.device_get(ghost_step(state, batch, key))

    # Identical loss components (same microbatch losses, same mean).
    for k in m_scan:
        np.testing.assert_allclose(
            m_scan[k], m_ghost[k], rtol=1e-5, atol=1e-5, err_msg=k
        )

    # Identical gradients ⇒ identical post-SGD params (fp32 forward;
    # tolerances absorb only the reduction-order noise between the two
    # differently-fused XLA programs).
    _tree_allclose(s_scan.params, s_ghost.params, 2e-4, 1e-5, "params")

    # Identical running stats including the A-fold EMA chain: the scan path
    # applies the chain literally (one EMA update per microbatch), the
    # ghost path in closed form.
    _tree_allclose(
        s_scan.batch_stats, s_ghost.batch_stats, 2e-4, 1e-5, "batch_stats"
    )

    assert int(s_ghost.step) == int(state.step) + 1


@pytest.mark.parametrize("accum", [1, 3])
def test_grouped_matches_scan(accum):
    """accum_mode="grouped" (flat batch + interceptor ghost-BN,
    train/ghost_bn.py) ≡ scan, with dropout OFF: grouped mode draws one
    flat dropout mask instead of per-group fold_in masks (identical in
    distribution, not bitwise), so the exact comparison disables dropout;
    BN statistics, the EMA chain, gradients and loss components must all
    match to reduction-order noise."""
    import dataclasses

    cfg = dataclasses.replace(TINY, regression_dropout=0.0)
    model, variables = init_model(cfg, batch_size=4, dtype=jnp.float32)
    state = create_train_state(model, variables, tx=optax.sgd(1e-2))

    rng = np.random.default_rng(42 + accum)
    batch = _batch(rng, accum, 4)
    key = jax.random.PRNGKey(7)

    scan_step = make_train_step(model, donate=False, accum_mode="scan")
    grouped_step = make_train_step(model, donate=False,
                                   accum_mode="grouped")

    s_scan, m_scan = jax.device_get(scan_step(state, batch, key))
    s_grp, m_grp = jax.device_get(grouped_step(state, batch, key))

    for k in m_scan:
        np.testing.assert_allclose(
            m_scan[k], m_grp[k], rtol=1e-5, atol=1e-5, err_msg=k
        )
    _tree_allclose(s_scan.params, s_grp.params, 2e-4, 1e-5, "params")
    _tree_allclose(
        s_scan.batch_stats, s_grp.batch_stats, 2e-4, 1e-5, "batch_stats"
    )
    assert int(s_grp.step) == int(state.step) + 1


def test_grouped_dropout_smoke(setup):
    """With dropout ON grouped mode still trains (finite loss/params) —
    masks are iid-equivalent to the scan path's, just not bitwise equal."""
    model, state = setup
    step = make_train_step(model, donate=False, accum_mode="grouped")
    batch = _batch(np.random.default_rng(3), 2, 4)
    s, m = jax.device_get(step(state, batch, jax.random.PRNGKey(0)))
    assert all(np.isfinite(v) for v in jax.tree_util.tree_leaves(m))
    assert all(
        np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(s.params)
    )


def test_grouped_rejects_custom_bn():
    """The interceptor must refuse DotStatsBatchNorm instead of silently
    computing whole-batch statistics."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, regression_dropout=0.0, normalization="batch_dot"
    )
    model, variables = init_model(cfg, batch_size=4, dtype=jnp.float32)
    state = create_train_state(model, variables, tx=optax.sgd(1e-2))
    step = make_train_step(model, donate=False, accum_mode="grouped")
    batch = _batch(np.random.default_rng(5), 2, 4)
    with pytest.raises(NotImplementedError, match="grouped"):
        step(state, batch, jax.random.PRNGKey(0))


def test_ghost_matches_scan_over_multiple_steps(setup):
    """Chained sanity over 4 optimizer steps with fresh data each step.

    The single-step test above proves exact semantic equality; over
    multiple steps the two differently-fused XLA programs' reduction-
    order noise (~1e-5) is amplified chaotically through the BN training
    dynamics (~5x/step observed), so the chained comparison can only be
    loose — it exists to catch catastrophic divergence (wrong EMA
    weighting, state mixing, NaNs), not bit-level drift."""
    model, state = setup
    scan_step = make_train_step(model, donate=False, accum_mode="scan")
    ghost_step = make_train_step(model, donate=False, accum_mode="ghost")

    s_scan = s_ghost = state
    rng = np.random.default_rng(11)
    for i in range(4):
        batch = _batch(rng, 2, 4)
        key = jax.random.PRNGKey(100 + i)
        s_scan, _ = scan_step(s_scan, batch, key)
        s_ghost, _ = ghost_step(s_ghost, batch, key)

    s_scan, s_ghost = jax.device_get((s_scan, s_ghost))
    _tree_allclose(s_scan.params, s_ghost.params, 5e-2, 5e-3, "params@4")
    _tree_allclose(
        s_scan.batch_stats, s_ghost.batch_stats, 5e-2, 5e-3, "bstats@4"
    )
