from pose3d_tpu.train.state import TrainState, create_train_state  # noqa: F401
from pose3d_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
from pose3d_tpu.train.loop import train_model  # noqa: F401
from pose3d_tpu.train.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
