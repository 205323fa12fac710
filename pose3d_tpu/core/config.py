"""Configuration system.

Three tiers, mirroring the reference's layering (reference src/config.py:4-73,
src/model_config.py:4-108, and per-CLI argparse):

  1. :class:`GlobalConfig` — training/runtime hyperparameters (seeds, batch
     size, loss weights, optimizer, augmentation ranges, paths).
  2. Per-architecture model configs (:class:`CNNModelConfig`,
     :class:`TransformerModelConfig`) — self-describing, serialized into
     checkpoints so a model can be reconstructed from its checkpoint alone
     (reference src/train.py:304, main.py:112-144).
  3. CLI flags override a subset (handled in ``pose3d_tpu/cli``).

All configs are plain dataclasses with ``to_dict``/``from_dict`` so they
round-trip through checkpoint metadata, and they are hashable/static so they
can be closed over by jitted functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Tuple


# Human3.6M 17-joint skeleton (reference src/config.py:49-73).
# 0 Pelvis, 1 RHip, 2 RKnee, 3 RAnkle, 4 LHip, 5 LKnee, 6 LAnkle,
# 7 Spine, 8 Thorax, 9 Neck, 10 Head, 11 LShoulder, 12 LElbow, 13 LWrist,
# 14 RShoulder, 15 RElbow, 16 RWrist
CONNECTIONS_H36M: Tuple[Tuple[int, int], ...] = (
    (0, 1), (1, 2), (2, 3),          # right leg
    (0, 4), (4, 5), (5, 6),          # left leg
    (0, 7), (7, 8), (8, 9), (9, 10),  # spine to head
    (8, 11), (11, 12), (12, 13),     # left arm
    (8, 14), (14, 15), (15, 16),     # right arm
)

# COCO-17 skeleton used by the 2D detector outputs (reference infer.py:22-41).
CONNECTIONS_COCO: Tuple[Tuple[int, int], ...] = (
    (0, 1), (0, 2), (1, 3), (2, 4), (0, 5), (0, 6), (5, 7), (7, 9),
    (6, 8), (8, 10), (5, 6), (5, 11), (6, 12), (11, 12), (11, 13),
    (13, 15), (12, 14), (14, 16),
)

# Left/right symmetric joint pairs in H3.6M order, used by the horizontal-flip
# augmentation (reference src/dataset/augmentation.py:224-234).
SYMMETRIC_JOINTS_H36M: Tuple[Tuple[int, int], ...] = (
    (1, 4), (2, 5), (3, 6), (11, 14), (12, 15), (13, 16),
)


@dataclass(frozen=True)
class GlobalConfig:
    """Runtime/training hyperparameters (reference src/config.py:4-47)."""

    random_seed: int = 42
    num_joints: int = 17
    batch_size: int = 10
    gradient_accumulation_steps: int = 10
    eval_interval: int = 5000
    preview_interval: int = 50
    model_type: str = "cnn"  # "cnn" | "transformer"

    # Loss weights (reference src/config.py:14-18).
    inter_joint_loss_weight: float = 100.0
    abs_root_loss_weight: float = 1.0
    l1_loss_weight: float = 1.0
    mse_loss_weight: float = 1.0

    # Optimizer (reference src/config.py:20-22).
    learning_rate: float = 1e-3
    weight_decay: float = 0.01

    # Host input pipeline knobs (reference src/config.py:24-26).
    num_workers: int = 1
    prefetch_batches: int = 2
    max_chunks_in_memory: int = 2

    # Augmentation (reference src/config.py:28-34).
    use_augmentation: bool = False
    rotation_range: Tuple[float, float] = (-30.0, 30.0)
    flip_prob: float = 0.5
    scale_range: Tuple[float, float] = (0.8, 1.2)
    translate_range: Tuple[float, float] = (-0.1, 0.1)
    brightness_range: Tuple[float, float] = (0.8, 1.2)
    contrast_range: Tuple[float, float] = (0.8, 1.2)

    # Paths (reference src/config.py:36-47). Kept as strings so the config
    # stays hashable/serializable.
    base_path: str = "/mnt/data/AI/Human3.6m"
    images_path: str = "/mnt/data/AI/Human3.6m/images"
    processed_path: str = "/mnt/data/AI/Human3.6m/processed"
    annotations_path: str = "/mnt/data/AI/Human3.6m/rannotations"
    log_dir: str = "./logs"
    cache_dir: str = "./dataset_cache"
    checkpoint_prefix: str = "model_epoch_"

    # TPU-specific knobs (new in this framework).
    compute_dtype: str = "bfloat16"   # dtype of activations in the hot path
    param_dtype: str = "float32"      # dtype of parameters
    mesh_shape: Tuple[int, ...] = (-1,)  # -1 = all devices on the data axis
    mesh_axes: Tuple[str, ...] = ("data",)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass(frozen=True)
class CNNModelConfig:
    """CNN lifting-model hyperparameters (reference src/model_config.py:56-100).

    Defaults reproduce the reference's published architecture exactly so a
    checkpoint-described model is reconstructable from ``model_args``.
    """

    model_type: str = "cnn"
    image_size: Tuple[int, int] = (500, 500)
    in_channels: int = 3 + 1 + 17  # RGB + depth + per-joint heatmaps
    num_joints: int = 17

    heatmap_size: int = 500
    heatmap_sigma: float = 10.0

    initial_channels: int = 64
    initial_kernel_size: int = 5
    initial_stride: int = 2

    stage_channels: Tuple[int, ...] = (128, 256, 512)
    stage_depths: Tuple[int, ...] = (3, 4, 5)
    stage_strides: Tuple[int, ...] = (2, 2, 2)
    stage_expand_ratios: Tuple[int, ...] = (1, 3, 6)

    use_se_blocks: bool = True
    se_reduction: int = 16
    use_dual_path_blocks: bool = True

    global_pool_size: int = 8
    global_feature_dim: int = 1024

    regression_dims: Tuple[int, ...] = (1024, 512)
    regression_dropout: float = 0.2

    activation: str = "silu"
    normalization: str = "batch"

    residual_scale: float = 1.0
    depthwise_kernel_size: int = 3

    def __post_init__(self):
        # Fail at config time with a clear message instead of an opaque
        # flax concat/shape error deep inside the first forward pass.
        h, w = self.image_size
        if self.heatmap_size != h or self.heatmap_size != w:
            raise ValueError(
                "CNNModelConfig: heatmap_size must equal image_size — the "
                "forward pass concatenates [image, depth, heatmaps] on the "
                "channel axis at full resolution (reference cnn.py:641-665); "
                f"got heatmap_size={self.heatmap_size}, "
                f"image_size={self.image_size}"
            )
        expected_in = 3 + 1 + self.num_joints
        if self.in_channels != expected_in:
            raise ValueError(
                "CNNModelConfig: in_channels must be 3 (RGB) + 1 (depth) + "
                f"num_joints heatmaps = {expected_in}; got {self.in_channels} "
                f"(num_joints={self.num_joints})"
            )
        if not (len(self.stage_channels) == len(self.stage_depths)
                == len(self.stage_strides) == len(self.stage_expand_ratios)):
            raise ValueError(
                "CNNModelConfig: stage_channels/stage_depths/stage_strides/"
                "stage_expand_ratios must all have the same length; got "
                f"{len(self.stage_channels)}/{len(self.stage_depths)}/"
                f"{len(self.stage_strides)}/{len(self.stage_expand_ratios)}"
            )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "CNNModelConfig":
        return _from_dict(cls, d)


@dataclass(frozen=True)
class TransformerModelConfig:
    """Transformer lifting-model hyperparameters
    (reference src/model_config.py:13-54).

    ``vit_model_name`` selects the image-stream backbone configuration; the
    default matches the reference's ``vit_base_patch16_384`` probe which
    resolves to embed_dim=768 / patch 16 (reference src/models/transformers.py:144-170).
    """

    model_type: str = "transformer"
    num_joints: int = 17
    heatmap_sigma: float = 2.0

    vit_model_name: str = "vit_base_patch16_384"
    vit_pretrained: bool = True
    vit_freeze_backbone: bool = False
    image_size: Tuple[int, int] = (512, 512)
    image_in_channels: int = 4  # RGB + depth

    heatmap_size: int = 64
    heatmap_patch_size: int = 16
    heatmap_in_channels: int = 17

    transformer_embed_dim: int = 768
    transformer_heads: int = 16
    transformer_mlp_ratio: float = 4.0
    transformer_dropout_rate: float = 0.1
    transformer_attention_dropout_rate: float = 0.1

    num_cross_modal_layers: int = 2
    final_encoder_depth: int = 4

    activation: str = "gelu"

    regression_hidden_dims: Tuple[int, ...] = (1024, 512, 256)
    regression_dropout: float = 0.25

    # Backbone internals (resolved from vit_model_name; ViT-Base/16).
    vit_depth: int = 12
    vit_heads: int = 12
    vit_patch_size: int = 16

    def __post_init__(self):
        h, w = self.image_size
        if h % self.vit_patch_size or w % self.vit_patch_size:
            raise ValueError(
                "TransformerModelConfig: image_size must be divisible by "
                f"vit_patch_size={self.vit_patch_size}; got {self.image_size}"
            )
        if self.heatmap_size % self.heatmap_patch_size:
            raise ValueError(
                "TransformerModelConfig: heatmap_size must be divisible by "
                f"heatmap_patch_size={self.heatmap_patch_size}; got "
                f"{self.heatmap_size}"
            )
        if self.transformer_embed_dim % self.transformer_heads:
            raise ValueError(
                "TransformerModelConfig: transformer_embed_dim must be "
                f"divisible by transformer_heads; got "
                f"{self.transformer_embed_dim} / {self.transformer_heads}"
            )
        if self.heatmap_in_channels != self.num_joints:
            raise ValueError(
                "TransformerModelConfig: heatmap_in_channels must equal "
                f"num_joints; got {self.heatmap_in_channels} vs "
                f"{self.num_joints}"
            )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TransformerModelConfig":
        return _from_dict(cls, d)


def _from_dict(cls, d: Dict[str, Any]):
    """Build a config from a (possibly checkpoint-loaded) dict, tolerating
    unknown keys and converting lists to tuples (JSON round-trips)."""
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in names:
            continue
        if isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[k] = v
    return cls(**kwargs)


def make_model_config(model_type: str = None, /, **kwargs):
    """Factory mirroring the reference's ``ModelConfig(model_type, **kwargs)``
    dispatch (reference src/model_config.py:4-11). ``kwargs`` may itself
    contain ``model_type`` (checkpoint model_args round-trip); the positional
    argument wins only when they agree, otherwise the kwargs value is used."""
    model_type = str(kwargs.pop("model_type", model_type)).lower()
    if model_type == "cnn":
        return CNNModelConfig.from_dict({**kwargs, "model_type": "cnn"})
    if model_type == "transformer":
        return TransformerModelConfig.from_dict(
            {**kwargs, "model_type": "transformer"}
        )
    raise ValueError(f"Unsupported model type: {model_type}")


def ensure_dirs(cfg: GlobalConfig) -> None:
    Path(cfg.log_dir).mkdir(parents=True, exist_ok=True)
    Path(cfg.cache_dir).mkdir(parents=True, exist_ok=True)
