from pose3d_tpu.stage1.api import (  # noqa: F401
    Stage1Result,
    CachedStage1,
    get_stage1_provider,
)
