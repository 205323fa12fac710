"""Tensor-parallel readiness: the ViT lifter trains on a 2×4 (data, model)
mesh with Megatron-style param sharding, matching the replicated result."""

import pytest
import numpy as np
import jax
from jax.sharding import PartitionSpec as P

from pose3d_tpu.core.config import TransformerModelConfig
from pose3d_tpu.core.mesh import make_mesh
from pose3d_tpu.models import init_model
from pose3d_tpu.parallel import shard_state_for_tp, tp_param_spec
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
        "depth": rng.uniform(1, 8, size=(a, b, 64, 64, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(
            0.1, 0.9, size=(a, b, 17, 2)
        ).astype(np.float32),
        "joints_3d": (rng.normal(size=(a, b, 17, 3)) * 100).astype(np.float32),
    }


def test_tp_specs_cover_big_kernels():
    model, variables = init_model(
        TINY_VIT, batch_size=1, attention_backend="xla"
    )
    specs = tp_param_spec(variables["params"])
    blk = specs["vit_backbone"]["block_0"]
    assert blk["Mlp_0"]["Dense_0"]["kernel"] == P(None, "model")
    assert blk["Mlp_0"]["Dense_1"]["kernel"] == P("model", None)
    assert blk["MultiHeadAttention_0"]["query"]["kernel"] == P(
        None, "model", None
    )
    assert blk["MultiHeadAttention_0"]["out"]["kernel"] == P(
        "model", None, None
    )
    # small things stay replicated
    assert specs["vit_backbone"]["cls_token"] == P()
    assert blk["LayerNorm_0"]["scale"] == P()


def test_tp_train_step_matches_replicated():
    mesh = make_mesh((2, 4), ("data", "model"))
    model, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla"
    )
    rng = np.random.default_rng(0)
    batch = _batch(rng, 1, 2)
    key = jax.random.PRNGKey(0)

    # replicated (pure DP on the data axis of the same mesh)
    s_ref = create_train_state(model, variables)
    step_ref = make_train_step(model, mesh=mesh, donate=False)
    out_ref, m_ref = step_ref(s_ref, batch, key)
    loss_ref = float(jax.device_get(m_ref)["total_loss"])

    # tensor-parallel
    s_tp = shard_state_for_tp(create_train_state(model, variables), mesh)
    k = s_tp.params["vit_backbone"]["block_0"]["Mlp_0"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    step_tp = make_train_step(
        model, mesh=mesh, donate=False, state_sharding="auto",
        state_like=s_tp,
    )
    out_tp, m_tp = step_tp(s_tp, batch, key)
    # the updated state keeps the Megatron layout (state_like pins the
    # out_shardings; unpinned, GSPMD may emit different output layouts
    # and force a recompile on the next call)
    k_out = out_tp.params["vit_backbone"]["block_0"]["Mlp_0"]["Dense_0"][
        "kernel"
    ]
    assert k_out.sharding.spec == P(None, "model")
    loss_tp = float(jax.device_get(m_tp)["total_loss"])

    np.testing.assert_allclose(loss_tp, loss_ref, rtol=2e-2)

    # Updated params agree within the AdamW first-step scale: with ν≈0 the
    # update is ≈ ±lr per coordinate, and bf16 reduction-order noise can
    # flip near-zero gradient coordinates — so the bound is 2.5·lr, not an
    # exact match.
    lr = 1e-3
    a = jax.device_get(out_ref.params)
    b = jax.device_get(out_tp.params)
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(x, y, atol=2.5 * lr, rtol=0)


@pytest.mark.slow
def test_tp_ghost_accum_with_pallas_kernel():
    """Ghost-BN accumulation vmaps the whole loss over groups; the fused
    attention kernel's custom_partitioning wrapper must stay vmappable
    (custom_vmap flattens the group axis into the kernel batch axis —
    round-3 regression: 'Batching rule for custom_partitioning not
    implemented'). Runs the REAL kernel (interpret) on a (2,4) TP mesh
    with accum=2, the driver-dryrun combination."""
    mesh = make_mesh((2, 4), ("data", "model"))
    model, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="pallas_interpret"
    )
    s_tp = shard_state_for_tp(create_train_state(model, variables), mesh)
    step = make_train_step(
        model, mesh=mesh, donate=False, state_sharding="auto",
        accum_mode="ghost",
    )
    rng = np.random.default_rng(3)
    batch = _batch(rng, 2, 2)  # A=2 groups — exercises a real vmap axis
    out, metrics = step(s_tp, batch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics)["total_loss"])
    assert np.isfinite(loss)
    assert int(jax.device_get(out.step)) == 1
