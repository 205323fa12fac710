from pose3d_tpu.parallel.tp import (  # noqa: F401
    tp_param_spec,
    shard_state_for_tp,
)
from pose3d_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_param_spec,
    shard_state_for_fsdp,
)
from pose3d_tpu.parallel.pp import (  # noqa: F401
    gpipe,
    make_pipeline_runner,
    pp_param_spec,
    shard_state_for_pp,
    stack_vit_blocks,
    unstack_vit_blocks,
)
