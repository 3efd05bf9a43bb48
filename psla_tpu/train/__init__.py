from psla_tpu.train.optim import (  # noqa: F401
    make_optimizer,
    psla_lr_schedule,
    bce_loss,
    ce_loss,
)
from psla_tpu.train.state import TrainState  # noqa: F401
from psla_tpu.train.step import build_train_step, build_eval_step  # noqa: F401
from psla_tpu.train.meters import AverageMeter  # noqa: F401
from psla_tpu.train.loop import Trainer  # noqa: F401
