from .clf_trainer import (
    SupervisedTrainConfig,
    SupervisedTrainer,
    make_supervised_batches,
)
from .gan_trainer import GANState, GANTrainConfig, GANTrainer, make_epoch_batches
from .uncond_gan_trainer import UncondGANState, UncondGANTrainConfig, UncondGANTrainer
from .vae_trainer import VAEState, VAETrainConfig, VAETrainer
