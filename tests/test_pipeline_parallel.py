"""Pipeline parallelism (parallel/pp.py): GPipe over a mesh ``stage`` axis.

The reference is single-device (SURVEY.md §2.2); these tests prove the
TPU-native pipeline schedule is *exactly* the sequential layer stack —
forward bit-identical, gradients to fp32 tolerance — and that the full
train step runs dp×pp with the stacked layer params staying stage-sharded
through the optimizer update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pose3d_tpu.core.config import TransformerModelConfig
from pose3d_tpu.core.mesh import make_mesh
from pose3d_tpu.models import init_model
from pose3d_tpu.models.transformer import ViTBackbone
from pose3d_tpu.parallel import (
    make_pipeline_runner,
    pp_param_spec,
    shard_state_for_pp,
    stack_vit_blocks,
    unstack_vit_blocks,
)
from pose3d_tpu.train import create_train_state, make_train_step
from pose3d_tpu.train.step import make_eval_step

TINY_VIT = TransformerModelConfig(
    image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
    transformer_embed_dim=64, transformer_heads=4,
    vit_depth=2, vit_heads=4, final_encoder_depth=1,
    num_cross_modal_layers=1, regression_hidden_dims=(32,),
)


def _backbones(depth=4, d=32):
    loop = ViTBackbone(embed_dim=d, depth=depth, num_heads=4, patch_size=8,
                       dtype=jnp.float32)
    stacked = ViTBackbone(embed_dim=d, depth=depth, num_heads=4,
                          patch_size=8, dtype=jnp.float32,
                          stacked_blocks=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 16, 16, 4)), jnp.float32
    )
    variables = jax.jit(lambda r: loop.init(r, x))(jax.random.PRNGKey(0))
    return loop, stacked, x, variables


def test_stack_unstack_round_trip_and_equivalence():
    loop, stacked, x, vl = _backbones()
    vs = {"params": stack_vit_blocks(vl["params"])}
    o_loop = jax.jit(loop.apply)(vl, x)
    o_stack = jax.jit(stacked.apply)(vs, x)
    # same per-sample ops in the same order -> bitwise equal
    np.testing.assert_array_equal(np.asarray(o_loop), np.asarray(o_stack))

    back = unstack_vit_blocks(vs["params"])
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), back, vl["params"]
    ))
    # fresh stacked init produces the same structure/shapes
    vs2 = jax.jit(lambda r: stacked.init(r, x))(jax.random.PRNGKey(1))
    assert jax.tree_util.tree_map(jnp.shape, vs2["params"]["blocks"]) == \
        jax.tree_util.tree_map(jnp.shape, vs["params"]["blocks"])


def test_gpipe_matches_sequential_fwd_and_grad():
    loop, stacked, x, vl = _backbones()
    vs = {"params": stack_vit_blocks(vl["params"])}
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("stage", "data"))
    pp = ViTBackbone(embed_dim=32, depth=4, num_heads=4, patch_size=8,
                     dtype=jnp.float32, stacked_blocks=True,
                     block_runner=make_pipeline_runner(
                         mesh, num_microbatches=2))
    specs = pp_param_spec(vs["params"])
    vp = {"params": jax.device_put(
        vs["params"],
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                               is_leaf=lambda n: isinstance(n, P)))}
    o_seq = jax.jit(stacked.apply)(vs, x)
    o_pp = jax.jit(pp.apply)(vp, x)
    np.testing.assert_array_equal(np.asarray(o_seq), np.asarray(o_pp))

    g_pp = jax.jit(jax.grad(lambda v, x: (pp.apply(v, x) ** 2).sum()))(vp, x)
    g_seq = jax.jit(jax.grad(lambda v, x: (stacked.apply(v, x) ** 2).sum()))(
        vs, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    # stacked-block grads come back stage-sharded (reduce stays local)
    one = jax.tree_util.tree_leaves(g_pp["params"]["blocks"])[0]
    assert one.sharding.spec == P("stage")


def test_pp_param_spec_targets_only_blocks():
    _, stacked, x, vl = _backbones()
    vs = stack_vit_blocks(vl["params"])
    specs = pp_param_spec(vs)
    flat = jax.tree_util.tree_leaves_with_path(
        specs, is_leaf=lambda n: isinstance(n, P))
    for path, spec in flat:
        keys = tuple(str(getattr(p, "key", "?")) for p in path)
        if "blocks" in keys:
            assert spec == P("stage")
        else:
            assert spec == P()


def _batch(rng, a, b, hw=64):
    return {
        "image": rng.uniform(size=(a, b, hw, hw, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(a, b, hw, hw, 1)).astype(
            np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(a, b, 17, 2)).astype(
            np.float32),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(
            np.float32),
    }


@pytest.mark.slow
def test_full_train_step_dp_x_pp():
    """Full lifter train step on a (data=2, stage=2) mesh: loss and updated
    params match the unpipelined stacked model; stage sharding survives the
    AdamW update."""
    mesh = make_mesh((2, 2), ("data", "stage"),
                     devices=jax.devices()[:4])
    runner = make_pipeline_runner(mesh, num_microbatches=2)
    model_pp, _ = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla",
        vit_stacked=True, vit_block_runner=runner,
    )
    model_seq, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla", vit_stacked=True,
    )

    batch = _batch(np.random.default_rng(0), 1, 4)
    key = jax.random.PRNGKey(0)

    # baseline: sequential stacked model, replicated data-parallel step
    mesh_dp = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    base_state = create_train_state(model_seq, variables)
    base_step = make_train_step(model_seq, mesh=mesh_dp, donate=False)
    base_out, base_metrics = base_step(base_state, batch, key)

    pp_state = shard_state_for_pp(
        create_train_state(model_pp, variables), mesh)
    pp_step = make_train_step(
        model_pp, mesh=mesh, donate=False,
        state_sharding="auto", state_like=pp_state,
    )
    pp_out, pp_metrics = pp_step(pp_state, batch, key)

    np.testing.assert_allclose(
        float(pp_metrics["total_loss"]), float(base_metrics["total_loss"]),
        rtol=1e-3,
    )
    # AdamW first step is ≈ ±lr per coordinate and the baseline reduces
    # its gradients over a different mesh factorization (4-way vs 2-way
    # data) — bf16 reduction-order noise can flip near-zero gradient
    # coordinates, so the bound is 2.5·lr (same as tests/test_tensor_
    # parallel.py), not elementwise-exact.
    lr = 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(pp_out.params),
                    jax.tree_util.tree_leaves(base_out.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5 * lr, rtol=0)
    # layout preserved through the update
    for before, after in zip(
        jax.tree_util.tree_leaves(pp_state.params),
        jax.tree_util.tree_leaves(pp_out.params),
    ):
        assert after.sharding == before.sharding

    # eval with the sharded state (ZeRO-style: auto shardings)
    eval_step = make_eval_step(model_pp, mesh=mesh, state_sharding="auto")
    em, preds = eval_step(pp_out, {k: v[0] for k, v in batch.items()})
    assert np.isfinite(float(em["mpjpe"]))
    assert preds.shape == (4, 17, 3)


@pytest.mark.slow
def test_train_step_dp_x_pp_x_tp():
    """3-D composition on 8 devices: batch over ``data``, ViT layers over
    ``stage`` (GPipe), Megatron head/hidden sharding over ``model`` —
    pp_param_spec(base_specs=tp_param_spec(...)) stacks to
    P("stage", ..., "model") on the blocks and plain Megatron elsewhere."""
    from pose3d_tpu.parallel import tp_param_spec
    from pose3d_tpu.parallel.pp import shard_state_for_pp

    mesh = make_mesh((2, 2, 2), ("data", "stage", "model"),
                     devices=jax.devices()[:8])
    runner = make_pipeline_runner(mesh, num_microbatches=2)
    model_pp, _ = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla",
        vit_stacked=True, vit_block_runner=runner,
    )
    model_seq, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla", vit_stacked=True,
    )
    batch = _batch(np.random.default_rng(2), 1, 4)
    key = jax.random.PRNGKey(2)

    # baseline mesh sized to the batch (4 samples -> 4-way data)
    mesh_dp = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    base_state = create_train_state(model_seq, variables)
    base_out, base_metrics = make_train_step(
        model_seq, mesh=mesh_dp, donate=False)(base_state, batch, key)

    state = shard_state_for_pp(
        create_train_state(model_pp, variables), mesh,
        base_specs=tp_param_spec(variables["params"]),
    )
    blk = state.params["vit_backbone"]["blocks"]
    assert blk["Mlp_0"]["Dense_0"]["kernel"].sharding.spec == \
        P("stage", None, "model")
    assert blk["MultiHeadAttention_0"]["query"]["kernel"].sharding.spec == \
        P("stage", None, "model", None)
    # non-stacked blocks keep plain Megatron specs
    fin = state.params["final_block_0"]
    assert fin["Mlp_0"]["Dense_0"]["kernel"].sharding.spec == \
        P(None, "model")

    step = make_train_step(model_pp, mesh=mesh, donate=False,
                           state_sharding="auto", state_like=state)
    out, metrics = step(state, batch, key)
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(base_metrics["total_loss"]),
        rtol=1e-3,
    )
    for before, after in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(out.params)):
        assert after.sharding == before.sharding


def test_gpipe_rejects_bad_divisibility():
    _, stacked, x, vl = _backbones()
    vs = stack_vit_blocks(vl["params"])
    mesh = Mesh(np.array(jax.devices()[:3]).reshape(3,), ("stage",))
    pp = ViTBackbone(embed_dim=32, depth=4, num_heads=4, patch_size=8,
                     dtype=jnp.float32, stacked_blocks=True,
                     block_runner=make_pipeline_runner(
                         mesh, num_microbatches=2))
    with pytest.raises(ValueError, match="not divisible"):
        jax.eval_shape(pp.apply, {"params": vs}, x)
