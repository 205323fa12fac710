from pose3d_tpu.geometry.camera import (  # noqa: F401
    world_to_camera,
    camera_to_pixel,
    normalize_depth,
    root_center,
)
from pose3d_tpu.geometry.metrics import mpjpe, pa_mpjpe, procrustes_align  # noqa: F401
