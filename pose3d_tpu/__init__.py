"""pose3d_tpu — a TPU-native JAX framework for two-stage monocular 3D human
pose estimation on Human3.6M.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference PyTorch project
AliEmreSenel/3DHumanPoseEstimation:

  * stage 1: 2D keypoint detection + monocular metric depth (``stage1/``)
  * stage 2: lifting networks (CNN and Transformer) that regress 17 3D
    joints from {RGB, depth, 2D keypoints} (``models/``)
  * chunked streaming input pipeline bit-compatible with the reference's
    tar-chunk format (``data/``)
  * composite loss, MPJPE / PA-MPJPE metrics (``ops/``, ``geometry/``)
  * pjit/shard_map data-parallel training with gradient accumulation,
    checkpointing, and TensorBoard logging (``train/``, ``parallel/``)
  * CLIs mirroring the reference's entry points (``cli/``)
"""

__version__ = "0.1.0"
