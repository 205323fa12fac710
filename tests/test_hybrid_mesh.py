"""Hybrid multi-slice mesh (core/mesh.make_hybrid_mesh): batch sharded
jointly over (replica=DCN, data=ICI), parameter/FSDP collectives confined
to the within-slice ``data`` axis — the scaling-book multi-slice layout.

CPU devices carry no slice_index, so tests group the 8 virtual devices
into fake "slices" via the explicit ``slice_key`` hook (the same mechanism
the driver dryrun uses); on real multi-slice TPU the default key is
``device.slice_index``.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pose3d_tpu.core.config import CNNModelConfig
from pose3d_tpu.core.mesh import (
    batch_axes,
    batch_spec_entry,
    data_sharding,
    local_batch_size,
    make_hybrid_mesh,
    make_mesh,
)
from pose3d_tpu.models import init_model
from pose3d_tpu.train import create_train_state, make_train_step

TINY = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),
)


def _two_fake_slices():
    devices = jax.devices()[:8]
    first = set(d.id for d in devices[:4])
    return devices, lambda d: 0 if d.id in first else 1


def _batch(rng, accum, b):
    return {
        "image": rng.uniform(size=(accum, b, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(accum, b, 32, 32, 1)).astype(
            np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(accum, b, 17, 2)).astype(
            np.float32),
        "joints_3d": (rng.normal(size=(accum, b, 17, 3)) * 100).astype(
            np.float32),
    }


def test_hybrid_mesh_construction():
    devices, key = _two_fake_slices()
    mesh = make_hybrid_mesh((4,), ("data",), devices=devices, slice_key=key)
    assert mesh.axis_names == ("replica", "data")
    assert dict(mesh.shape) == {"replica": 2, "data": 4}
    # each replica-row must hold exactly one slice's devices
    for row, want in zip(np.asarray(mesh.devices), (0, 1)):
        assert {key(d) for d in row} == {want}


def test_hybrid_mesh_infers_ici_shape():
    devices, key = _two_fake_slices()
    mesh = make_hybrid_mesh(devices=devices, slice_key=key)  # ici = (-1,)
    assert dict(mesh.shape) == {"replica": 2, "data": 4}


def test_hybrid_mesh_rejects_unequal_slices():
    devices = jax.devices()[:7]  # 4 + 3
    with pytest.raises(ValueError, match="unequal"):
        make_hybrid_mesh(devices=devices,
                         slice_key=lambda d: 0 if d.id < 4 else 1)


def test_hybrid_mesh_rejects_wrong_ici_shape():
    devices, key = _two_fake_slices()
    with pytest.raises(ValueError, match="does not cover"):
        make_hybrid_mesh((3,), devices=devices, slice_key=key)


def test_single_group_degenerates():
    devices = jax.devices()[:4]
    mesh = make_hybrid_mesh(devices=devices, slice_key=lambda d: 0)
    assert dict(mesh.shape) == {"replica": 1, "data": 4}


def test_batch_spec_helpers():
    devices, key = _two_fake_slices()
    hybrid = make_hybrid_mesh((4,), devices=devices, slice_key=key)
    flat = make_mesh((8,), ("data",), devices=devices)
    assert batch_axes(hybrid) == ("replica", "data")
    assert batch_axes(flat) == ("data",)
    assert batch_spec_entry(hybrid) == ("replica", "data")
    assert batch_spec_entry(flat) == "data"
    assert local_batch_size(16, hybrid) == 2
    assert local_batch_size(16, flat) == 2
    sh = data_sharding(hybrid, ndim=3)
    assert sh.spec == P(("replica", "data"), None, None)


@pytest.mark.slow
def test_hybrid_train_step_matches_flat_mesh():
    """One grouped-accumulation train step on the (2,4) hybrid mesh must
    agree with the same step on the flat 8-device data mesh — the hybrid
    layout changes device placement, not the program's math."""
    devices, key = _two_fake_slices()
    hybrid = make_hybrid_mesh((4,), devices=devices, slice_key=key)
    flat = make_mesh((8,), ("data",), devices=devices)

    model, variables = init_model(TINY, batch_size=8)
    rng = np.random.default_rng(0)
    batch = _batch(rng, accum=2, b=8)
    k = jax.random.PRNGKey(0)

    losses = {}
    states = {}
    for name, mesh in (("hybrid", hybrid), ("flat", flat)):
        state = create_train_state(model, variables)
        step = make_train_step(model, mesh=mesh, donate=False)
        out, metrics = step(state, batch, k)
        losses[name] = float(jax.device_get(metrics)["total_loss"])
        states[name] = jax.device_get(out.params)

    assert np.isfinite(losses["hybrid"])
    np.testing.assert_allclose(losses["hybrid"], losses["flat"], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(states["hybrid"]),
                    jax.tree_util.tree_leaves(states["flat"])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_hybrid_fsdp_keeps_params_within_slice():
    """FSDP on the hybrid mesh: params/moments shard over the within-slice
    ``data`` axis only (ICI) and stay replicated across ``replica`` (DCN)
    — and the layout survives the update."""
    from pose3d_tpu.parallel import shard_state_for_fsdp

    devices, key = _two_fake_slices()
    hybrid = make_hybrid_mesh((4,), devices=devices, slice_key=key)
    model, variables = init_model(TINY, batch_size=8)
    state = shard_state_for_fsdp(
        create_train_state(model, variables), hybrid, min_size=512
    )
    step = make_train_step(model, mesh=hybrid, donate=False,
                           state_sharding="auto", state_like=state)
    rng = np.random.default_rng(1)
    out, metrics = step(state, _batch(rng, 2, 8), jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(metrics)["total_loss"]))

    some_sharded = False
    for before, after in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(out.params)):
        assert after.sharding == before.sharding, "fsdp layout lost"
        names = jax.tree_util.tree_leaves(list(after.sharding.spec))
        assert "replica" not in names, (
            f"param sharded across slices (DCN): {after.sharding.spec}"
        )
        some_sharded = some_sharded or "data" in names
    assert some_sharded, "no parameter was actually FSDP-sharded"


@pytest.mark.slow
def test_grouped_step_compute_stays_data_parallel():
    """Regression for the round-5 grouped-mode sharding fix: with the B
    axis sharded, the A-major [A,B]→[A·B] flatten interleaved ownership
    along the flat axis, and GSPMD responded by ALL-GATHERING the whole
    batch and running every convolution replicated at the full flat batch
    on all devices (zero data-parallel speedup). The group-minor flatten
    (train/step.py grouped_step) keeps the flat axis contiguously sharded.

    Asserts on the compiled SPMD HLO of a 4-device hybrid mesh:
      * no collective moves a full-batch image-sized operand;
      * convolutions run at the LOCAL batch (flat/4), not the global one;
      * the only batch-stat traffic is [G, C]-sized all-reduces.
    """
    import re

    devices = jax.devices()[:4]
    mesh = make_hybrid_mesh(
        (2,), devices=devices, slice_key=lambda d: d.id < devices[2].id
    )
    accum, b = 2, 4
    flat = accum * b
    model, variables = init_model(TINY, batch_size=b)
    state = create_train_state(model, variables)
    step = make_train_step(model, mesh=mesh, donate=False,
                           accum_mode="grouped")
    rng = np.random.default_rng(0)
    txt = step.lower(state, _batch(rng, accum, b), jax.random.PRNGKey(0)
                     ).compile().as_text()

    coll_re = re.compile(
        r"%(?:all-reduce|all-gather|reduce-scatter|all-to-all)[.0-9]* = "
        r"\(?[a-z0-9]+\[([0-9,]*)\]"
    )
    for m in coll_re.finditer(txt):
        dims = [int(x) for x in m.group(1).split(",") if x]
        n_elems = int(np.prod(dims)) if dims else 1
        # image-scale collective = the all-gather regression; BN stat
        # partials are [G, C] (tiny), gradient all-reduce is param-sized.
        assert n_elems < flat * 32 * 32, (
            f"full-batch-scale collective in grouped step: {m.group(0)}"
        )

    conv_re = re.compile(r"= [a-z0-9]+\[([0-9,]+)\]\{[^}]*\} convolution")
    # Feature-map convolutions are NHWC with square spatial dims >= 4
    # (TINY runs 32->16->8); weight-gradient convs have kernel-sized
    # (3x3/1x1) middle dims and channel-sized leading dims — exclude them.
    batch_convs = []
    for m in conv_re.finditer(txt):
        dims = [int(x) for x in m.group(1).split(",")]
        if len(dims) == 4 and dims[1] == dims[2] and dims[1] >= 4:
            batch_convs.append(dims[0])
    assert batch_convs, "no feature-map convolutions found in compiled HLO"
    assert all(bc != flat for bc in batch_convs), (
        f"convolution at the full flat batch {flat}: compute is replicated"
    )
    assert any(bc == flat // 4 for bc in batch_convs), (
        f"no convolution at local batch {flat // 4}; got {set(batch_convs)}"
    )
