from pose3d_tpu.ops.heatmap import gaussian_heatmaps  # noqa: F401
from pose3d_tpu.ops.losses import composite_pose_loss, LossWeights  # noqa: F401
from pose3d_tpu.ops.activations import get_activation  # noqa: F401
