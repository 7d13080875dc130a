"""Training runtime: optimizers/schedules, DP mesh train step, trainer loop,
checkpointing."""

from litehandnet_tpu.train.optim import (  # noqa: F401
    make_optimizer,
    make_lr_schedule,
)
from litehandnet_tpu.train.state import TrainState  # noqa: F401
from litehandnet_tpu.train.distributed import (  # noqa: F401
    make_mesh,
    make_train_step,
    make_eval_step,
)
