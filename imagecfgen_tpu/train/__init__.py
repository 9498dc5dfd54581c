from .gan_trainer import GANState, GANTrainer, GANTrainConfig
