from pose3d_tpu.parallel.tp import (  # noqa: F401
    tp_param_spec,
    shard_state_for_tp,
)
from pose3d_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_param_spec,
    shard_state_for_fsdp,
)
