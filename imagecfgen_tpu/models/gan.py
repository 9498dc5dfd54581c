"""Unconditional spectrogram GAN / WGAN-GP (capability parity with the
reference's ``gans/audio_mnist.py``: latent 100, dense-stem generator to
128^2, 5-conv discriminator, selectable "gan" | "wgan" loss with gradient
penalty — ``gans/audio_mnist.py:27-61,160-224,300-326``; note that module's
own data loader is broken on main, SURVEY §2.4 — the capability is rebuilt
against the shared AudioMNIST pipeline)."""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Plan, PlanSequential


@dataclasses.dataclass(frozen=True)
class UncondGANConfig:
    latent_dim: int = 100
    image_size: Tuple[int, int] = (128, 128)
    d: int = 64
    init_std: float = 0.001
    compute_dtype: Any = jnp.float32

    @property
    def gen_plan(self) -> Plan:
        lr = ("lrelu", 0.2)
        d = self.d
        return (
            ("dense", 256 * d),
            ("reshape", (4, 4, 16 * d)), lr,
            ("convT", 8 * d, 5, 2, 2, 1), lr,
            ("convT", 4 * d, 5, 2, 2, 1), lr,
            ("convT", 2 * d, 5, 2, 2, 1), lr,
            ("convT", d, 5, 2, 2, 1), lr,
            ("convT", 1, 5, 2, 2, 1),
            ("tanh",),
        )

    @property
    def disc_plan(self) -> Plan:
        lr = ("lrelu", 0.2)
        d = self.d
        return (
            ("conv", d, 5, 2, 0), lr,
            ("conv", 2 * d, 5, 2, 0), lr,
            ("conv", 4 * d, 5, 2, 0), lr,
            ("conv", 8 * d, 5, 2, 0), lr,
            ("conv", 16 * d, 5, 2, 0), lr,
            ("flatten",),
            ("dense", 1),
        )


class UncondGenerator(nn.Module):
    cfg: UncondGANConfig

    @nn.compact
    def __call__(self, z, *, train: bool = False):
        z = z.reshape((z.shape[0], -1))
        return PlanSequential(
            self.cfg.gen_plan, self.cfg.init_std, self.cfg.compute_dtype, name="trunk"
        )(z, train=train).astype(jnp.float32)


class UncondDiscriminator(nn.Module):
    cfg: UncondGANConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return PlanSequential(
            self.cfg.disc_plan, self.cfg.init_std, self.cfg.compute_dtype, name="trunk"
        )(x, train=train).astype(jnp.float32)


def gradient_penalty(disc_apply, params, real, fake, rng) -> jnp.ndarray:
    """WGAN-GP penalty on random interpolates
    (reference ``image_scms/training_utils.py:131-147``)."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
    interp = eps * real + (1.0 - eps) * fake

    def disc_sum(x):
        return disc_apply(params, x).sum()

    grads = jax.grad(disc_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
    return ((norms - 1.0) ** 2).mean()


def wgan_disc_loss(disc_apply, params, real, fake, rng, penalty_weight: float = 10.0):
    """E[D(fake)] - E[D(real)] + lambda * GP
    (reference ``training_utils.py:150-162``)."""
    loss = disc_apply(params, fake).mean() - disc_apply(params, real).mean()
    return loss + penalty_weight * gradient_penalty(disc_apply, params, real, fake, rng)
