from ladder_tpu.training.losses import compute_loss, identity_gm
from ladder_tpu.training.optim import adam_init, adam_update, clip_grads
from ladder_tpu.training.schedules import all_lrs
from ladder_tpu.training.step import (
    group_keys,
    init_state,
    make_eval_step,
    make_forward_fns,
    make_train_step,
)

__all__ = [
    "compute_loss",
    "identity_gm",
    "adam_init",
    "adam_update",
    "clip_grads",
    "all_lrs",
    "group_keys",
    "init_state",
    "make_eval_step",
    "make_forward_fns",
    "make_train_step",
]
