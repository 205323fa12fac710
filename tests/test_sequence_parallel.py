"""Sequence parallelism (parallel/sp.py): Megatron-SP residual-stream
sharding composing with the Megatron TP param specs.

The reference is single-device; SURVEY.md §5 scopes ring-attention out.
SP here is the standard companion to tensor parallelism: token-sharded
LayerNorm/residual regions between the head/hidden-sharded matmuls, with
GSPMD choosing the reduce-scatter/all-gather decomposition. These tests
assert numerical equivalence with plain TP and that the constraint
actually lands (sharded intermediate layout in the compiled module)."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from pose3d_tpu.core.config import TransformerModelConfig
from pose3d_tpu.core.mesh import make_mesh
from pose3d_tpu.models import init_model
from pose3d_tpu.parallel import shard_state_for_tp
from pose3d_tpu.parallel.sp import make_sp_constraint
from pose3d_tpu.train import create_train_state, make_train_step

TINY_VIT = TransformerModelConfig(
    image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
    transformer_embed_dim=64, transformer_heads=4,
    vit_depth=2, vit_heads=4, final_encoder_depth=1,
    num_cross_modal_layers=1, regression_hidden_dims=(32,),
)


def _batch(rng, a, b):
    return {
        "image": rng.uniform(size=(a, b, 64, 64, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(a, b, 64, 64, 1)).astype(
            np.float32),
        "keypoints_2d": rng.uniform(0.1, 0.9, size=(a, b, 17, 2)).astype(
            np.float32),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(
            np.float32),
    }


def test_sp_train_step_matches_tp():
    """TP+SP and plain TP must produce the same loss and (to bf16
    reduction-order tolerance) the same updated params: SP only changes
    WHERE the residual-stream math runs, not what it computes."""
    mesh = make_mesh((2, 4), ("data", "model"))
    model_tp, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla"
    )
    model_sp, _ = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla",
        sp_constraint=make_sp_constraint(mesh),
    )
    batch = _batch(np.random.default_rng(0), 1, 2)
    key = jax.random.PRNGKey(0)

    s_tp = shard_state_for_tp(create_train_state(model_tp, variables), mesh)
    step_tp = make_train_step(
        model_tp, mesh=mesh, donate=False, state_sharding="auto",
        state_like=s_tp,
    )
    out_tp, m_tp = step_tp(s_tp, batch, key)

    s_sp = shard_state_for_tp(create_train_state(model_sp, variables), mesh)
    step_sp = make_train_step(
        model_sp, mesh=mesh, donate=False, state_sharding="auto",
        state_like=s_sp,
    )
    out_sp, m_sp = step_sp(s_sp, batch, key)

    np.testing.assert_allclose(
        float(m_sp["total_loss"]), float(m_tp["total_loss"]), rtol=1e-3
    )
    # AdamW first step is ≈ ±lr per coordinate; bf16 reduction-order noise
    # can flip near-zero gradient coordinates (same bound as the TP test).
    lr = 1e-3
    for x, y in zip(jax.tree_util.tree_leaves(jax.device_get(out_tp.params)),
                    jax.tree_util.tree_leaves(jax.device_get(out_sp.params))):
        np.testing.assert_allclose(x, y, atol=2.5 * lr, rtol=0)
    # Megatron layout survives the update under SP too
    k = out_sp.params["vit_backbone"]["block_0"]["Mlp_0"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")


def test_sp_constraint_is_rank_guarded():
    mesh = make_mesh((2, 4), ("data", "model"))
    sp = make_sp_constraint(mesh)
    x2d = jax.numpy.ones((4, 8))
    assert sp(x2d) is x2d  # non-token streams pass through untouched


def test_sp_composes_with_stacked_blocks():
    """SP inside the scanned (stacked) layer stack: the constraint wraps
    each block application in the scan body."""
    mesh = make_mesh((2, 4), ("data", "model"))
    model, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla",
        vit_stacked=True,
    )
    model_sp, _ = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla",
        vit_stacked=True, sp_constraint=make_sp_constraint(mesh),
    )
    batch = _batch(np.random.default_rng(1), 1, 2)
    key = jax.random.PRNGKey(1)
    s0 = create_train_state(model, variables)
    out0, m0 = make_train_step(model, mesh=mesh, donate=False)(
        s0, batch, key)
    s1 = shard_state_for_tp(create_train_state(model_sp, variables), mesh)
    step1 = make_train_step(model_sp, mesh=mesh, donate=False,
                            state_sharding="auto", state_like=s1)
    out1, m1 = step1(s1, batch, key)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m0["total_loss"]), rtol=2e-2
    )
