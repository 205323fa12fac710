from pose3d_tpu.core.config import (  # noqa: F401
    GlobalConfig,
    CNNModelConfig,
    TransformerModelConfig,
    make_model_config,
    CONNECTIONS_H36M,
    CONNECTIONS_COCO,
    SYMMETRIC_JOINTS_H36M,
)
from pose3d_tpu.core.mesh import make_mesh, data_sharding, replicated  # noqa: F401
