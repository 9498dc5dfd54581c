"""Evaluation classifiers, oracles and per-class autoencoders.

One CNN-classifier implementation covering the reference's per-domain
copies: ``MNISTClassifier`` (``classifiers/mnist.py:11-24``),
``AudioMNISTClassifier`` (``classifiers/audio_mnist.py:21-64``),
``NARWClassifier`` (``classifiers/whalecalls.py``), the 10 binary
per-digit oracles (``train_morphomnist_oracles.py:12-33``) and the conv
autoencoders used for CF-realism metrics (``train_morphomnist_ae.py``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Plan, PlanSequential


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    plan: Plan
    image_size: Tuple[int, int]
    image_channels: int = 1
    n_classes: int = 10
    init_std: Any = None  # torch-default-ish fan-in init
    compute_dtype: Any = jnp.float32


class CNNClassifier(nn.Module):
    cfg: ClassifierConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = PlanSequential(
            self.cfg.plan, self.cfg.init_std, self.cfg.compute_dtype, name="trunk"
        )(x, train=train)
        return out.astype(jnp.float32)


def mnist_classifier_config() -> ClassifierConfig:
    """4-conv digit classifier, 28 -> 26 -> 12 -> 10 -> 4 -> dense(10)
    (reference ``classifiers/mnist.py:11-24``; flatten width 4*4*256=4096)."""
    lr = ("lrelu", 0.2)
    plan = (
        ("conv", 32, 3, 1, 0), lr,
        ("conv", 64, 3, 2, 0), lr,
        ("conv", 128, 3, 1, 0), lr,
        ("conv", 256, 3, 2, 0), lr,
        ("flatten",),
        ("dense", 10),
    )
    return ClassifierConfig(plan=plan, image_size=(28, 28), n_classes=10)


def mnist_oracle_config() -> ClassifierConfig:
    """Binary per-digit oracle: same trunk, 1 output logit (BCE)
    (reference ``train_morphomnist_oracles.py:12-33``)."""
    lr = ("lrelu", 0.2)
    plan = (
        ("conv", 32, 3, 1, 0), lr,
        ("conv", 64, 3, 2, 0), lr,
        ("conv", 128, 3, 1, 0), lr,
        ("conv", 256, 3, 2, 0), lr,
        ("flatten",),
        ("dense", 1),
    )
    return ClassifierConfig(plan=plan, image_size=(28, 28), n_classes=1)


def audio_mnist_classifier_config(num_classes: int = 10, width: float = 1.0) -> ClassifierConfig:
    """7-conv AudioMNIST attribute classifier over 128^2 spectrograms,
    parametric over the target attribute including the 60-way ``subject``
    head (reference ``classifiers/audio_mnist.py:20-42``):
    128 -> 126 -> 62 -> 60 -> 29 -> 14 -> 6 -> 2, flatten 4096 ->
    dense 1024 -> dense num_classes. ``width`` scales every channel count
    (1.0 = reference widths)."""
    lr = ("lrelu", 0.2)
    w = lambda c: max(int(c * width), 8)
    plan = (
        ("conv", w(32), 3, 1, 0), lr,
        ("conv", w(64), 3, 2, 0), lr,
        ("conv", w(128), 3, 1, 0), lr,
        ("conv", w(256), 3, 2, 0), lr,
        ("conv", w(512), 3, 2, 0), lr,
        ("conv", w(1024), 3, 2, 0), lr,
        ("conv", w(1024), 3, 2, 0), lr,
        ("flatten",),
        ("dense", w(1024)), lr,
        ("dense", num_classes),
    )
    return ClassifierConfig(plan=plan, image_size=(128, 128), n_classes=num_classes)


def narw_classifier_config(num_classes: int = 3, width: float = 1.0) -> ClassifierConfig:
    """8-conv NARW call-type classifier over 256^2 spectrograms
    (reference ``classifiers/whalecalls.py:228-254``); ``width`` scales
    channel counts (1.0 = reference widths)."""
    lr = ("lrelu", 0.2)
    w = lambda c: max(int(c * width), 8)
    plan = (
        ("conv", w(32), 3, 1, 0), lr,
        ("conv", w(64), 3, 2, 0), lr,
        ("conv", w(128), 3, 1, 0), lr,
        ("conv", w(256), 3, 2, 0), lr,
        ("conv", w(512), 3, 2, 0), lr,
        ("conv", w(1024), 3, 2, 0), lr,
        ("conv", w(1024), 3, 2, 0), lr,
        ("conv", w(1024), 3, 2, 0), lr,
        ("flatten",),
        ("dense", w(1024)), lr,
        ("dense", num_classes),
    )
    return ClassifierConfig(plan=plan, image_size=(256, 256), n_classes=num_classes)


@dataclasses.dataclass(frozen=True)
class AutoEncoderConfig:
    latent_dim: int = 100
    image_size: Tuple[int, int] = (28, 28)
    compute_dtype: Any = jnp.float32


class ConvAutoEncoder(nn.Module):
    """Per-class conv autoencoder for the CF realism metric
    (reference ``train_morphomnist_ae.py:12-60``; latent 100)."""

    cfg: AutoEncoderConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        lr = ("lrelu", 0.2)
        enc_plan = (
            ("conv", 32, 3, 2, 1), lr,     # 28 -> 14
            ("conv", 64, 3, 2, 1), lr,     # 14 -> 7
            ("conv", 128, 3, 2, 1), lr,    # 7 -> 4
            ("flatten",),
            ("dense", self.cfg.latent_dim),
        )
        dec_plan = (
            ("dense", 4 * 4 * 128),
            ("reshape", (4, 4, 128)), lr,
            ("convT", 64, 3, 2, 1), lr,    # 4 -> 7
            ("convT", 32, 4, 2, 1), lr,    # 7 -> 14
            ("convT", 1, 4, 2, 1),         # 14 -> 28
            ("tanh",),
        )
        z = PlanSequential(enc_plan, None, self.cfg.compute_dtype, name="encoder")(
            x, train=train
        )
        y = PlanSequential(dec_plan, None, self.cfg.compute_dtype, name="decoder")(
            z, train=train
        )
        return y.astype(jnp.float32)
