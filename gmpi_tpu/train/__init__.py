from gmpi_tpu.train.losses import d_gan_loss, g_gan_loss, r1_penalty
from gmpi_tpu.train.step import (
    TrainState,
    flat_pose_from_c2w,
    init_train_state,
    make_optimizers,
    make_train_step,
)

__all__ = [
    "TrainState",
    "d_gan_loss",
    "flat_pose_from_c2w",
    "g_gan_loss",
    "init_train_state",
    "make_optimizers",
    "make_train_step",
    "r1_penalty",
]
