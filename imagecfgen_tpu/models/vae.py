"""DeepSCM conditional-VAE baseline — one parametric implementation.

Covers the reference's three per-domain VAEs (28^2 ``deepscm_vae/mnist.py``,
128^2 ``deepscm_vae/audio_mnist.py``, 256^2 ``deepscm_vae/whalecalls.py``):
encoder = the BiGAN encoder trunk + 1x1-conv mean / log-var heads
(``deepscm_vae/mnist.py:42-56``), decoder mirrors the BiGAN generator, and
the likelihood is an isotropic Gaussian centred on the decoder output with
fixed log-variance (decoder-as-AffineTransform,
``deepscm_vae/mnist.py:94-116``).

The ELBO (``deepscm_vae/mnist.py:121-133``) Monte-Carlo-averages the
conditional log-likelihood over ``num_samples`` reparameterised draws
(vmapped on TPU rather than a Python loop) minus the analytic KL to
N(0, I).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bigan import BiGANConfig, mnist_bigan_config
from .layers import AttributeChannels, AttributeVectors, PlanSequential


class VAEEncoder(nn.Module):
    cfg: BiGANConfig

    @nn.compact
    def __call__(self, x, attrs: Mapping[str, jnp.ndarray], *, train: bool = False):
        cfg = self.cfg
        feats = AttributeChannels(
            cfg.attr_spec, cfg.image_size, cfg.embed_dim, cfg.embed_hw,
            cfg.compute_dtype, name="attr_channels",
        )(x, attrs)
        h = PlanSequential(
            cfg.enc_plan + cfg.vae_trunk_tail, cfg.init_std, cfg.compute_dtype,
            name="trunk",
        )(feats, train=train)
        mean = PlanSequential(
            (("conv", cfg.latent_dim, 1, 1, 0),), cfg.init_std, cfg.compute_dtype,
            name="mean_head",
        )(h, train=train)
        log_var = PlanSequential(
            (("conv", cfg.latent_dim, 1, 1, 0),), cfg.init_std, cfg.compute_dtype,
            name="log_var_head",
        )(h, train=train)
        return mean.astype(jnp.float32), log_var.astype(jnp.float32)


class VAEDecoder(nn.Module):
    cfg: BiGANConfig

    @nn.compact
    def __call__(self, z, attrs: Mapping[str, jnp.ndarray], *, train: bool = False):
        cfg = self.cfg
        vec = AttributeVectors(
            cfg.attr_spec, cfg.embed_dim, cfg.compute_dtype, name="attr_vectors"
        )(attrs)
        if cfg.gen_input == "spatial":
            z = z.reshape((z.shape[0], 1, 1, -1))
            feats = jnp.concatenate(
                [z.astype(cfg.compute_dtype), vec.reshape((vec.shape[0], 1, 1, -1))],
                axis=-1,
            )
        else:
            feats = jnp.concatenate(
                [z.reshape((z.shape[0], -1)).astype(cfg.compute_dtype), vec], axis=-1
            )
        x = PlanSequential(cfg.gen_plan, cfg.init_std, cfg.compute_dtype, name="trunk")(
            feats, train=train
        )
        return x.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class ConditionalVAE:
    """Module bundle + pure ELBO / sampling functions."""

    cfg: BiGANConfig
    obs_log_var: float = -5.0  # fixed observation log-variance (mnist.py:96)

    @property
    def encoder(self) -> VAEEncoder:
        return VAEEncoder(self.cfg)

    @property
    def decoder(self) -> VAEDecoder:
        return VAEDecoder(self.cfg)

    def encode_sample(self, params_enc, rng, x, attrs, train=False):
        """Reparameterised draw from q(z|x,c). NOTE: the reference scales by
        the *variance* rather than the std here (``deepscm_vae/mnist.py:61``)
        — we use the standard reparameterisation."""
        mean, log_var = self.encoder.apply({"params": params_enc}, x, attrs, train=train)
        std = jnp.exp(0.5 * log_var)
        return mean + std * jax.random.normal(rng, mean.shape)

    def elbo(
        self,
        params: Mapping,
        rng,
        x,
        attrs,
        num_samples: int = 4,
        kl_weight: float = 1.0,
        train: bool = False,
    ) -> jnp.ndarray:
        """Mean ELBO over the batch (reference ``deepscm_vae/mnist.py:121-133``).

        The MC samples are folded into the batch axis **batch-major**
        (z: (B, S, ...) -> (B*S, ...)) and the decoder runs once at batch
        B*S. A ``vmap`` over samples would instead merge (S, B) with the
        sharded B minor — a layout GSPMD cannot express, so the compiled
        DP program all-gathered the batch and recomputed the full decoder
        redundantly on every device (caught by tests/test_collectives.py).
        The B-major merge keeps each device's shard contiguous: the same
        program is a pure gradient all-reduce again, and the decoder's MXU
        batch grows S-fold."""
        mean, log_var = self.encoder.apply(
            {"params": params["encoder"]}, x, attrs, train=train
        )
        std = jnp.exp(0.5 * log_var)
        b = x.shape[0]
        s = num_samples
        x_flat = x.reshape((b, -1))
        obs_std = jnp.exp(self.obs_log_var / 2.0)

        eps = jax.random.normal(rng, (b, s) + mean.shape[1:], mean.dtype)
        z = (mean[:, None] + std[:, None] * eps).reshape((b * s,) + mean.shape[1:])
        attrs_rep = {k: jnp.repeat(v, s, axis=0) for k, v in attrs.items()}
        dec = self.decoder.apply(
            {"params": params["decoder"]}, z, attrs_rep, train=train
        ).reshape((b, s, -1))
        # log N(x; dec, obs_std^2 I), summed over pixels, MC-averaged over s
        d = (x_flat[:, None] - dec) / obs_std
        lp = -0.5 * (d**2).sum(axis=2) - x_flat.shape[1] * (
            jnp.log(obs_std) + 0.5 * jnp.log(2.0 * jnp.pi)
        )
        lp = lp.mean(axis=1)

        var = std**2
        dkl = 0.5 * (var + mean**2 - 1.0 - jnp.log(var)).reshape((x.shape[0], -1)).sum(
            axis=1
        )
        return (lp - kl_weight * dkl).mean()


def mnist_vae_config(latent_dim: int = 512, compute_dtype: Any = jnp.float32) -> BiGANConfig:
    """VAE reuses the MNIST BiGAN channel plans with the VAE init scale
    (``deepscm_vae/training_utils.py:30-35``: N(0, 1e-4))."""
    cfg = mnist_bigan_config(latent_dim=latent_dim, compute_dtype=compute_dtype)
    return dataclasses.replace(cfg, init_std=1e-4)


def audio_mnist_vae_config(
    d: int = 64, latent_dim: int = 512, compute_dtype: Any = jnp.float32
) -> BiGANConfig:
    """128^2 AudioMNIST VAE (``deepscm_vae/audio_mnist.py:176-321``):
    the audio BiGAN trunk + 1x1 mean / log-var heads; fixed observation
    log-variance -5 handled by :class:`ConditionalVAE`."""
    from .bigan import audio_mnist_bigan_config

    cfg = audio_mnist_bigan_config(d=d, latent_dim=latent_dim, compute_dtype=compute_dtype)
    return dataclasses.replace(cfg, init_std=1e-4)


def whale_vae_config(
    d: int = 64, latent_dim: int = 512, compute_dtype: Any = jnp.float32
) -> BiGANConfig:
    """256^2 whale-call VAE (``deepscm_vae/whalecalls.py:342-370``; its
    diagonal-Normal base with ``.sum(1)`` equals the MVN form used by the
    other domains, so one ELBO implementation covers all three). Unlike
    the MNIST/audio VAEs its encoder trunk has no trailing LeakyReLU
    (``deepscm_vae/whalecalls.py:249-263``)."""
    from .bigan import whale_bigan_config

    cfg = whale_bigan_config(d=d, latent_dim=latent_dim, compute_dtype=compute_dtype)
    return dataclasses.replace(cfg, init_std=1e-4, vae_trunk_tail=())
