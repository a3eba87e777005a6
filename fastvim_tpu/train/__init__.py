from fastvim_tpu.train.mixup import (
    accuracy,
    cross_entropy,
    mixup_cutmix,
    one_hot_smooth,
    soft_target_cross_entropy,
)
from fastvim_tpu.train.optim import (
    ema_update,
    vitdet_layer_decay_scales,
    layer_decay_scales,
    make_optimizer,
    make_sgd,
    wd_mask,
)
from fastvim_tpu.train.schedules import (
    constant,
    cosine_with_warmup,
    scale_lr,
    warmup_multistep,
)
from fastvim_tpu.train.state import TrainState
from fastvim_tpu.train.trainer import (
    make_mae_train_step,
    make_supervised_eval_step,
    make_supervised_train_step,
)

__all__ = [
    "TrainState",
    "accuracy",
    "constant",
    "cosine_with_warmup",
    "cross_entropy",
    "ema_update",
    "layer_decay_scales",
    "make_mae_train_step",
    "make_optimizer",
    "make_sgd",
    "make_supervised_eval_step",
    "make_supervised_train_step",
    "mixup_cutmix",
    "one_hot_smooth",
    "scale_lr",
    "soft_target_cross_entropy",
    "vitdet_layer_decay_scales",
    "warmup_multistep",
    "wd_mask",
]
