from .checkpoint import (
    load_checkpoint,
    load_ckpt_partial,
    save_checkpoint,
)
from .ema import ema_update
from .trainer import Trainer
from .trainer_24p import Trainer24P
from .lr_schedule import LRScheduler, yolox_warm_cos_lr
from .optimizer import build_sgd
from .steps import (
    TrainState,
    create_train_state,
    make_train_step_24p,
    make_train_step_bbox,
)
