from .bigan import (
    BiGAN,
    BiGANConfig,
    audio_mnist_bigan_config,
    esrf_bigan_config,
    mnist_bigan_config,
    whale_bigan_config,
)
from .classifier import (
    AutoEncoderConfig,
    ClassifierConfig,
    CNNClassifier,
    ConvAutoEncoder,
    mnist_classifier_config,
    mnist_oracle_config,
)
from .layers import AttributeChannels, AttributeVectors, PlanSequential
from .vae import ConditionalVAE, VAEDecoder, VAEEncoder, mnist_vae_config
