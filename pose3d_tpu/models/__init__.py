from pose3d_tpu.models.common import PoseRegressionHead  # noqa: F401
from pose3d_tpu.models.cnn import CNNPoseEstimation  # noqa: F401
from pose3d_tpu.models.transformer import TransformerPoseEstimation  # noqa: F401
from pose3d_tpu.models.factory import build_model, init_model  # noqa: F401
