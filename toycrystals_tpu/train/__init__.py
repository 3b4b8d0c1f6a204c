from toycrystals_tpu.train.state import TrainState, create_train_state
from toycrystals_tpu.train.distill import (
    make_distill_train_epoch,
    make_distill_train_step,
)
from toycrystals_tpu.train.steps import (
    make_vae_train_step,
    make_vae_train_epoch,
    make_prior_train_step,
    make_prior_train_epoch,
    make_sde_train_step,
    make_sde_train_epoch,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_vae_train_step",
    "make_vae_train_epoch",
    "make_prior_train_step",
    "make_prior_train_epoch",
    "make_sde_train_step",
    "make_sde_train_epoch",
    "make_distill_train_step",
    "make_distill_train_epoch",
]
