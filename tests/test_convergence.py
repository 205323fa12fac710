"""Learning validation: the training stack must be able to OVERFIT a fixed
batch — loss dropping by an order of magnitude proves heatmaps → model →
loss → grads → AdamW → normalization statistics all learn together (the
standard sanity check; a plateau would indicate broken gradients or state
threading). Covered for BOTH model families (CNN and transformer)."""

import numpy as np
import jax
import pytest

from pose3d_tpu.core.config import CNNModelConfig, TransformerModelConfig
from pose3d_tpu.models import init_model
from pose3d_tpu.ops.losses import LossWeights
from pose3d_tpu.train import create_train_state, make_train_step

TINY = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=32,
    regression_dims=(32,),
)
TINY_VIT = TransformerModelConfig(
    image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
    transformer_embed_dim=64, transformer_heads=4,
    vit_depth=2, vit_heads=4, final_encoder_depth=2,
    num_cross_modal_layers=1, regression_hidden_dims=(32,),
)


def _task_batch(rng, n, size=32):
    """joints = W·kpts (fixed linear map of the 2D keypoints)."""
    kpts = rng.uniform(0.1, 0.9, size=(n, 17, 2)).astype(np.float32)
    W = np.arange(6).reshape(2, 3).astype(np.float32) * 10
    joints = (kpts @ W).astype(np.float32)
    joints = joints - joints[:, :1]
    return {
        "image": np.full((n, size, size, 3), 0.5, np.float32),
        "depth": np.full((n, size, size, 1), 4.0, np.float32),
        "keypoints_2d": kpts,
        "joints_3d": joints,
    }


@pytest.mark.slow
def test_training_overfits_fixed_batch():
    rng = np.random.default_rng(0)
    model, variables = init_model(TINY, batch_size=8)
    state = create_train_state(model, variables, learning_rate=3e-3)
    weights = LossWeights(mse=1.0, l1=1.0, inter_joint=1.0, abs_root=1.0)
    step = make_train_step(model, weights, donate=False)

    fixed = {k: v[None] for k, v in _task_batch(rng, 8).items()}
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(200):
        state, metrics = step(state, fixed, key)
        losses.append(float(jax.device_get(metrics)["total_loss"]))

    assert losses[-1] < losses[0] / 10, (losses[0], losses[-1])
    assert losses[-1] < 20.0


@pytest.mark.slow
def test_transformer_training_overfits_fixed_batch():
    """Same oracle for the ViT family: grads must flow through the patch
    embed, cross-modal fusion, final encoder and regression head together
    (reference src/transformers.py:326-373 is the architecture spec)."""
    rng = np.random.default_rng(0)
    model, variables = init_model(TINY_VIT, batch_size=8)
    state = create_train_state(model, variables, learning_rate=1e-3)
    weights = LossWeights(mse=1.0, l1=1.0, inter_joint=1.0, abs_root=1.0)
    step = make_train_step(model, weights, donate=False)

    fixed = {k: v[None] for k, v in _task_batch(rng, 8, size=64).items()}
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(200):
        state, metrics = step(state, fixed, key)
        losses.append(float(jax.device_get(metrics)["total_loss"]))

    assert losses[-1] < losses[0] / 10, (losses[0], losses[-1])
    assert losses[-1] < 20.0
