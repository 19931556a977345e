from tpugan.train.state import TrainState, create_train_state  # noqa: F401
from tpugan.train.steps import build_train_step  # noqa: F401
from tpugan.train.trainer import (  # noqa: F401
    NonFiniteLossError,
    Trainer,
)
