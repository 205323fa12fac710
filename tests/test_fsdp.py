"""FSDP (ZeRO-3) readiness: params + optimizer moments sharded over the
``data`` axis, GSPMD inserting the all-gathers/reduce-scatters, with the
updated state coming back still sharded (no silent gather-to-replicated).

The reference has no distributed training at all (SURVEY.md §2.2); this is
the TPU-native memory-scaling mode on top of the same train step."""

import pytest
import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from pose3d_tpu.core.config import CNNModelConfig, TransformerModelConfig
from pose3d_tpu.core.mesh import make_mesh
from pose3d_tpu.models import init_model
from pose3d_tpu.parallel import (
    fsdp_param_spec,
    shard_state_for_fsdp,
    tp_param_spec,
)
from pose3d_tpu.train import create_train_state, make_train_step

TINY_CNN = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),
)

TINY_VIT = TransformerModelConfig(
    image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
    transformer_embed_dim=64, transformer_heads=4,
    vit_depth=2, vit_heads=4, final_encoder_depth=1,
    num_cross_modal_layers=1, regression_hidden_dims=(32,),
)


def _batch(rng, a, b, hw=32):
    return {
        "image": rng.uniform(size=(a, b, hw, hw, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(a, b, hw, hw, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(a, b, 17, 2)).astype(
            np.float32
        ),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(
            np.float32
        ),
    }


@pytest.mark.slow
def test_fsdp_specs_shard_large_params_only():
    model, variables = init_model(TINY_CNN, batch_size=1)
    specs = fsdp_param_spec(variables["params"], axis_size=8, min_size=512)
    leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    spec_leaves = dict(
        (jax.tree_util.keystr(p), s)
        for p, s in jax.tree_util.tree_leaves_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
    )
    n_sharded = 0
    for path, leaf in leaves:
        spec = spec_leaves[jax.tree_util.keystr(path)]
        if leaf.size < 512:
            assert spec == P(), (path, leaf.shape, spec)
            continue
        if "data" in spec:
            i = list(spec).index("data")
            assert leaf.shape[i] % 8 == 0, (path, leaf.shape, spec)
            n_sharded += 1
        else:  # big but no dim divisible by 8
            assert all(d % 8 for d in leaf.shape), (path, leaf.shape)
    assert n_sharded >= 3  # conv kernels + dense layers actually shard


def test_fsdp_respects_tp_base_specs():
    model, variables = init_model(
        TINY_VIT, batch_size=1, attention_backend="xla"
    )
    base = tp_param_spec(variables["params"])
    specs = fsdp_param_spec(
        variables["params"], axis_size=2, base_specs=base, min_size=512
    )
    blk = specs["vit_backbone"]["block_0"]
    # TP dim preserved, FSDP added on a remaining dim → 2-D layout
    assert blk["Mlp_0"]["Dense_0"]["kernel"] == P("data", "model")
    assert blk["Mlp_0"]["Dense_1"]["kernel"] == P("model", "data")
    # attention qkv [D=64, H=4, head=16]: model on heads, data on D
    assert blk["MultiHeadAttention_0"]["query"]["kernel"] == P(
        "data", "model", None
    )
    # small leaves stay as their base
    assert blk["LayerNorm_0"]["scale"] == P()


@pytest.mark.slow
def test_fsdp_train_step_matches_replicated():
    mesh = make_mesh((8,), ("data",))
    model, variables = init_model(TINY_CNN, batch_size=8)
    rng = np.random.default_rng(0)
    batch = _batch(rng, 2, 8)
    key = jax.random.PRNGKey(0)

    s_ref = create_train_state(model, variables)
    step_ref = make_train_step(model, mesh=mesh, donate=False)
    out_ref, m_ref = step_ref(s_ref, batch, key)
    loss_ref = float(jax.device_get(m_ref)["total_loss"])

    s_fsdp = shard_state_for_fsdp(
        create_train_state(model, variables), mesh, min_size=512
    )
    # the committed placement actually shards (per-device bytes < global)
    kernels = [
        x for x in jax.tree_util.tree_leaves(s_fsdp.params)
        if x.size >= 512 and x.sharding.spec != P()
    ]
    assert kernels, "no param ended up sharded"
    for k in kernels:
        assert k.addressable_shards[0].data.size == k.size // 8

    step = make_train_step(
        model, mesh=mesh, donate=False, state_sharding="auto",
        state_like=s_fsdp,
    )
    out, m = step(s_fsdp, batch, key)
    loss = float(jax.device_get(m)["total_loss"])
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-5)

    # updated state keeps the FSDP layout — ZeRO-3 memory must persist
    # across steps, not collapse to replicated after the first update
    for before, after in zip(
        jax.tree_util.tree_leaves(s_fsdp.params),
        jax.tree_util.tree_leaves(out.params),
    ):
        assert after.sharding.spec == before.sharding.spec

    # numerics: same updated params as the replicated step (fp32 CPU mesh
    # ⇒ tight tolerance; collectives only reorder reductions)
    a = jax.device_get(out_ref.params)
    b = jax.device_get(out.params)
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(x, y, atol=1e-5, rtol=1e-4)

    # the validation path feeds the SAME sharded state to the eval step;
    # jit REJECTS committed args that conflict with a pinned replicated
    # spec, so FSDP eval must use state_sharding="auto" (sharding left to
    # the arrays; GSPMD all-gathers at use — standard ZeRO-3 eval)
    from pose3d_tpu.train.step import make_eval_step

    eval_step = make_eval_step(model, mesh=mesh, state_sharding="auto")
    em, preds = eval_step(out, {k: v[0] for k, v in batch.items()})
    assert np.isfinite(float(jax.device_get(em)["mpjpe"]))


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """Saving from a ZeRO-3-sharded state must gather and write the full
    arrays (orbax path via bulk_device_get), and restore bit-exact into a
    fresh replicated state."""
    from pose3d_tpu.train.checkpoint import (
        restore_train_state,
        save_checkpoint,
    )

    mesh = make_mesh((8,), ("data",))
    model, variables = init_model(TINY_CNN, batch_size=8)
    s = shard_state_for_fsdp(
        create_train_state(model, variables), mesh, min_size=512
    )
    path = save_checkpoint(tmp_path / "ck", s, "cnn", {"note": "fsdp"})

    restored, meta = restore_train_state(
        create_train_state(model, variables), path
    )
    assert meta["model_type"] == "cnn"
    assert int(jax.device_get(restored.step)) == int(jax.device_get(s.step))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s.params)),
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)


def test_fsdp_tp_combined_vit_step():
    """2-D fsdp×tp on a (2,4) mesh: Megatron specs on the model axis plus
    ZeRO-3 sharding of the remaining dims over data."""
    mesh = make_mesh((2, 4), ("data", "model"))
    model, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla"
    )
    state = create_train_state(model, variables)
    base = tp_param_spec(state.params)
    s2d = shard_state_for_fsdp(state, mesh, base_specs=base, min_size=512)
    k = s2d.params["vit_backbone"]["block_0"]["Mlp_0"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P("data", "model")

    step = make_train_step(
        model, mesh=mesh, donate=False, state_sharding="auto",
        state_like=s2d,
    )
    out, metrics = step(s2d, _batch(np.random.default_rng(3), 1, 2, hw=64),
                        jax.random.PRNGKey(1))
    assert np.isfinite(float(jax.device_get(metrics)["total_loss"]))
    k2 = out.params["vit_backbone"]["block_0"]["Mlp_0"]["Dense_0"]["kernel"]
    assert k2.sharding.spec == P("data", "model")


def test_fsdp_ema_follows_param_shardings():
    """EMA weights mirror the param tree, so ZeRO-3 must shard them with
    the SAME specs (commit.py) and the step must keep the layout."""
    mesh = make_mesh((8,), ("data",))
    model, variables = init_model(TINY_CNN, batch_size=8)
    s = shard_state_for_fsdp(
        create_train_state(model, variables, ema=True), mesh, min_size=512
    )
    for p, e in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s.ema_params)):
        assert e.sharding.spec == p.sharding.spec

    step = make_train_step(
        model, mesh=mesh, donate=False, state_sharding="auto",
        state_like=s, ema_decay=0.9,
    )
    out, _ = step(s, _batch(np.random.default_rng(5), 1, 8),
                  jax.random.PRNGKey(0))
    for p, e in zip(jax.tree_util.tree_leaves(out.params),
                    jax.tree_util.tree_leaves(out.ema_params)):
        assert e.sharding.spec == p.sharding.spec
