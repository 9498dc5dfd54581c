"""Conditional ALI/BiGAN family — one parametric implementation.

Covers the reference's four per-domain copies (28^2 MNIST
``image_scms/mnist.py:21-154``, 128^2 AudioMNIST
``image_scms/audio_mnist.py:173-318``, 256^2 whale calls
``image_scms/whalecalls.py:230-387``, 512^2 ESRF
``image_scms/esrf_acoustic.py:134-260``) with a single Encoder / Generator /
Discriminator triple driven by plan data.

Structure:

- ``Encoder``:  image ++ attribute channels -> conv plan -> (B,1,1,latent)
- ``Generator``: latent ++ attribute vector -> either 1x1-spatial deconv plan
  (MNIST-style) or dense-stem plan (audio-style) -> image in [-1,1] (tanh at
  the end of the plan)
- ``Discriminator``: joint D(x, z, c) = dxz(dx(x ++ attr channels) ++ dz(z)),
  logits shape (B, 1) — reference ``image_scms/mnist.py:142-154``.

All modules take ``train`` and use rng collection ``"dropout"`` when training
(D has channel dropout + batch norm; reference ``image_scms/mnist.py:98-136``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.attributes import AttributeSpec, MNIST_SPEC
from .layers import AttributeChannels, AttributeVectors, Plan, PlanSequential


@dataclasses.dataclass(frozen=True)
class BiGANConfig:
    image_size: Tuple[int, int]
    image_channels: int
    latent_dim: int
    attr_spec: AttributeSpec
    enc_plan: Plan
    gen_plan: Plan
    dx_plan: Plan
    dz_plan: Plan
    dxz_plan: Plan
    embed_dim: int = 256
    embed_hw: Tuple[int, int] = (16, 16)
    init_std: float = 0.01
    compute_dtype: Any = jnp.float32
    # "spatial": attribute vector becomes 1x1 channels next to z (MNIST style)
    # "dense":   z ++ attrs flattened into the plan's dense stem (audio style)
    gen_input: str = "spatial"
    # appended to enc_plan when the config backs a VAE encoder trunk: the
    # reference's MNIST/audio VAE encoders end with LeakyReLU before the
    # mean / log-var heads (deepscm_vae/mnist.py:40, audio_mnist.py:207)
    # but the whale VAE's does not (deepscm_vae/whalecalls.py:249-263)
    vae_trunk_tail: Plan = (("lrelu", 0.2),)


class Encoder(nn.Module):
    cfg: BiGANConfig

    @nn.compact
    def __call__(self, x, attrs: Mapping[str, jnp.ndarray], *, train: bool = False):
        cfg = self.cfg
        feats = AttributeChannels(
            cfg.attr_spec,
            cfg.image_size,
            cfg.embed_dim,
            cfg.embed_hw,
            cfg.compute_dtype,
            name="attr_channels",
        )(x, attrs)
        z = PlanSequential(
            cfg.enc_plan, cfg.init_std, cfg.compute_dtype, name="trunk"
        )(feats, train=train)
        return z.astype(jnp.float32)


class Generator(nn.Module):
    cfg: BiGANConfig

    @nn.compact
    def __call__(self, z, attrs: Mapping[str, jnp.ndarray], *, train: bool = False):
        cfg = self.cfg
        vec = AttributeVectors(
            cfg.attr_spec, cfg.embed_dim, cfg.compute_dtype, name="attr_vectors"
        )(attrs)
        if cfg.gen_input == "spatial":
            z = z.reshape((z.shape[0], 1, 1, -1))
            v = vec.reshape((vec.shape[0], 1, 1, -1))
            feats = jnp.concatenate([z.astype(cfg.compute_dtype), v], axis=-1)
        elif cfg.gen_input == "dense":
            feats = jnp.concatenate(
                [z.reshape((z.shape[0], -1)).astype(cfg.compute_dtype), vec], axis=-1
            )
        else:
            raise ValueError(cfg.gen_input)
        x = PlanSequential(
            cfg.gen_plan, cfg.init_std, cfg.compute_dtype, name="trunk"
        )(feats, train=train)
        return x.astype(jnp.float32)


class Discriminator(nn.Module):
    cfg: BiGANConfig

    @nn.compact
    def __call__(self, x, z, attrs: Mapping[str, jnp.ndarray], *, train: bool = False):
        cfg = self.cfg
        feats = AttributeChannels(
            cfg.attr_spec,
            cfg.image_size,
            cfg.embed_dim,
            cfg.embed_hw,
            cfg.compute_dtype,
            name="attr_channels",
        )(x, attrs)
        dx = PlanSequential(cfg.dx_plan, cfg.init_std, cfg.compute_dtype, name="dx")(
            feats, train=train
        )
        z = z.reshape((z.shape[0], 1, 1, -1))
        dz = PlanSequential(cfg.dz_plan, cfg.init_std, cfg.compute_dtype, name="dz")(
            z, train=train
        )
        joint = jnp.concatenate([dx, dz], axis=-1)
        out = PlanSequential(
            cfg.dxz_plan, cfg.init_std, cfg.compute_dtype, name="dxz"
        )(joint, train=train)
        return out.reshape((out.shape[0], 1)).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class BiGAN:
    """Bundle of the three modules for one config."""

    cfg: BiGANConfig

    @property
    def encoder(self) -> Encoder:
        return Encoder(self.cfg)

    @property
    def generator(self) -> Generator:
        return Generator(self.cfg)

    @property
    def discriminator(self) -> Discriminator:
        return Discriminator(self.cfg)


AUDIO_MNIST_SPEC = AttributeSpec.create(
    accent=15, age=5, country_of_origin=13, digit=10, gender=2, native_speaker=2
)


def audio_mnist_bigan_config(
    d: int = 64, latent_dim: int = 512, compute_dtype: Any = jnp.float32
) -> BiGANConfig:
    """128x128 AudioMNIST spectrogram config.

    Matches the reference AudioMNIST BiGAN (``image_scms/audio_mnist.py:
    173-318``): 6 categorical attributes each embedded to a 128^2 channel
    (Embed(n,256) -> (16,16) -> x8 upsample -> tanh); encoder/D-x towers are
    six k5/s2/p1 convs 128 -> 63 -> 31 -> 15 -> 7 -> 3 -> 1; the generator
    is Linear(512 + 6*256 -> 256d) -> (4,4,16d) -> five k5/s2/p2(+1) deconvs
    doubling 4 -> 128; LeakyReLU 0.2 everywhere, init N(0, 0.001)
    (``audio_mnist.py:33-38``), no dropout/batch-norm.
    """
    lr = ("lrelu", 0.2)
    enc_plan = (
        ("conv", d, 5, 2, 1), lr,
        ("conv", 2 * d, 5, 2, 1), lr,
        ("conv", 4 * d, 5, 2, 1), lr,
        ("conv", 8 * d, 5, 2, 1), lr,
        ("conv", 16 * d, 5, 2, 1), lr,
        ("conv", latent_dim, 5, 2, 1),
    )
    gen_plan = (
        ("dense", 256 * d),
        ("reshape", (4, 4, 16 * d)), lr,
        ("convT", 8 * d, 5, 2, 2, 1), lr,
        ("convT", 4 * d, 5, 2, 2, 1), lr,
        ("convT", 2 * d, 5, 2, 2, 1), lr,
        ("convT", d, 5, 2, 2, 1), lr,
        ("convT", 1, 5, 2, 2, 1),
        ("tanh",),
    )
    dx_plan = enc_plan
    dz_plan = (
        ("conv", latent_dim, 1, 1, 0), lr,
        ("conv", latent_dim, 1, 1, 0), lr,
    )
    dxz_plan = (
        ("conv", 1024, 1, 1, 0), lr,
        ("conv", 1024, 1, 1, 0), lr,
        ("conv", 1, 1, 1, 0),
    )
    return BiGANConfig(
        image_size=(128, 128),
        image_channels=1,
        latent_dim=latent_dim,
        attr_spec=AUDIO_MNIST_SPEC,
        enc_plan=enc_plan,
        gen_plan=gen_plan,
        dx_plan=dx_plan,
        dz_plan=dz_plan,
        dxz_plan=dxz_plan,
        init_std=0.001,
        compute_dtype=compute_dtype,
        gen_input="dense",
    )


WHALE_SPEC = AttributeSpec.create(call_type=3)
ESRF_SPEC = AttributeSpec.create(has_boat=2, closest_boat=0)


def whale_bigan_config(
    d: int = 64, latent_dim: int = 512, compute_dtype: Any = jnp.float32
) -> BiGANConfig:
    """256x256 whale-call spectrogram config (NARW nocall/shotgun/upcall).

    Matches ``image_scms/whalecalls.py:230-387``: only ``call_type`` is
    embedded (the reference's ``time``/``path`` entries are passthrough
    metadata, ``whalecalls.py:14-18``); E/D-x are seven k5/s2/p1 convs
    256 -> ... -> 1; G is Linear(512+256 -> 256d) -> (4,4,16d) -> six
    k5/s2/p2(+1) deconvs 4 -> 256; init N(0, 0.001).
    """
    lr = ("lrelu", 0.2)
    enc_plan = (
        ("conv", d, 5, 2, 1), lr,
        ("conv", 2 * d, 5, 2, 1), lr,
        ("conv", 4 * d, 5, 2, 1), lr,
        ("conv", 8 * d, 5, 2, 1), lr,
        ("conv", 16 * d, 5, 2, 1), lr,
        ("conv", 16 * d, 5, 2, 1), lr,
        ("conv", latent_dim, 5, 2, 1),
    )
    gen_plan = (
        ("dense", 256 * d),
        ("reshape", (4, 4, 16 * d)), lr,
        ("convT", 16 * d, 5, 2, 2, 1), lr,
        ("convT", 8 * d, 5, 2, 2, 1), lr,
        ("convT", 4 * d, 5, 2, 2, 1), lr,
        ("convT", 2 * d, 5, 2, 2, 1), lr,
        ("convT", d, 5, 2, 2, 1), lr,
        ("convT", 1, 5, 2, 2, 1),
        ("tanh",),
    )
    dx_plan = (
        ("conv", d, 5, 2, 1), lr,
        ("conv", 2 * d, 5, 2, 1), lr,
        ("conv", 2 * d, 5, 2, 1), lr,
        ("conv", 4 * d, 5, 2, 1), lr,
        ("conv", 8 * d, 5, 2, 1), lr,
        ("conv", 16 * d, 5, 2, 1), lr,
        ("conv", latent_dim, 5, 2, 1),
    )
    dz_plan = (("conv", latent_dim, 1, 1, 0), lr, ("conv", latent_dim, 1, 1, 0), lr)
    dxz_plan = (("conv", 1024, 1, 1, 0), lr, ("conv", 1024, 1, 1, 0), lr, ("conv", 1, 1, 1, 0))
    return BiGANConfig(
        image_size=(256, 256),
        image_channels=1,
        latent_dim=latent_dim,
        attr_spec=WHALE_SPEC,
        enc_plan=enc_plan,
        gen_plan=gen_plan,
        dx_plan=dx_plan,
        dz_plan=dz_plan,
        dxz_plan=dxz_plan,
        init_std=0.001,
        compute_dtype=compute_dtype,
        gen_input="dense",
    )


def esrf_bigan_config(
    d: int = 64, latent_dim: int = 512, compute_dtype: Any = jnp.float32
) -> BiGANConfig:
    """512x512 ESRF marine-acoustics config (boat presence/proximity).

    Matches ``image_scms/esrf_acoustic.py:134-260``: ``has_boat`` embedded
    (16,16 -> x32), ``closest_boat`` as a continuous constant channel
    (E/D) / scalar (G); E/D-x are eight k5/s2/p1 convs 512 -> ... -> 1
    (widest tower in the reference, 64d channels); G is
    Linear(512+257 -> 256d) -> seven deconvs 4 -> 512.
    """
    lr = ("lrelu", 0.2)
    enc_plan = (
        ("conv", d, 5, 2, 1), lr,
        ("conv", 2 * d, 5, 2, 1), lr,
        ("conv", 4 * d, 5, 2, 1), lr,
        ("conv", 8 * d, 5, 2, 1), lr,
        ("conv", 16 * d, 5, 2, 1), lr,
        ("conv", 32 * d, 5, 2, 1), lr,
        ("conv", 64 * d, 5, 2, 1), lr,
        ("conv", latent_dim, 5, 2, 1),
    )
    gen_plan = (
        ("dense", 256 * d),
        ("reshape", (4, 4, 16 * d)), lr,
        ("convT", 16 * d, 5, 2, 2, 1), lr,
        ("convT", 8 * d, 5, 2, 2, 1), lr,
        ("convT", 4 * d, 5, 2, 2, 1), lr,
        ("convT", 2 * d, 5, 2, 2, 1), lr,
        ("convT", d, 5, 2, 2, 1), lr,
        ("convT", d, 5, 2, 2, 1), lr,
        ("convT", 1, 5, 2, 2, 1),
        ("tanh",),
    )
    dz_plan = (("conv", latent_dim, 1, 1, 0), lr, ("conv", latent_dim, 1, 1, 0), lr)
    dxz_plan = (("conv", 1024, 1, 1, 0), lr, ("conv", 1024, 1, 1, 0), lr, ("conv", 1, 1, 1, 0))
    return BiGANConfig(
        image_size=(512, 512),
        image_channels=1,
        latent_dim=latent_dim,
        attr_spec=ESRF_SPEC,
        enc_plan=enc_plan,
        gen_plan=gen_plan,
        dx_plan=enc_plan,
        dz_plan=dz_plan,
        dxz_plan=dxz_plan,
        init_std=0.001,
        compute_dtype=compute_dtype,
        gen_input="dense",
    )


def mnist_bigan_config(
    latent_dim: int = 512, compute_dtype: Any = jnp.float32
) -> BiGANConfig:
    """28x28 Morpho-MNIST config.

    Channel plan and layer ordering match the reference MNIST BiGAN
    (``image_scms/mnist.py:21-136``): 5-conv encoder to a (1,1,512) latent,
    5-deconv generator, D with (dx, dz, dxz) heads, dropout + batch norm in
    dx only, LeakyReLU 0.2 in E/G and 0.1 in D.
    """
    lr, lrd = ("lrelu", 0.2), ("lrelu", 0.1)
    enc_plan = (
        ("conv", 64, 3, 2, 1), lr,
        ("conv", 128, 4, 2, 1), lr,
        ("conv", 256, 4, 2, 1), lr,
        ("conv", 512, 4, 2, 1), lr,
        ("conv", latent_dim, 1, 2, 0),
    )
    gen_plan = (
        ("convT", 512, 3, 1, 0), lr,
        ("convT", 256, 3, 2, 0), lr,
        ("convT", 128, 3, 2, 1), lr,
        ("convT", 64, 3, 2, 1), lr,
        ("convT", 1, 4, 1, 0),
        ("tanh",),
    )
    dx_plan = (
        ("drop2d", 0.2),
        ("conv", 32, 5, 1, 0), lrd,
        ("drop2d", 0.2), ("bn",),
        ("conv", 64, 4, 2, 0), lrd,
        ("bn",), ("drop2d", 0.5),
        ("conv", 128, 4, 1, 0), lrd,
        ("bn",), ("drop2d", 0.5),
        ("conv", 256, 4, 2, 0), lrd,
        ("bn",), ("drop2d", 0.5),
        ("conv", 512, 3, 1, 0), lrd,
    )
    dz_plan = (
        ("drop2d", 0.2),
        ("conv", 512, 1, 1, 0), lrd,
        ("drop2d", 0.5),
        ("conv", 512, 1, 1, 0), lrd,
    )
    dxz_plan = (
        ("drop2d", 0.2),
        ("conv", 1024, 1, 1, 0), lrd,
        ("drop2d", 0.2),
        ("conv", 1024, 1, 1, 0), lrd,
        ("drop2d", 0.2),
        ("conv", 1, 1, 1, 0),
    )
    return BiGANConfig(
        image_size=(28, 28),
        image_channels=1,
        latent_dim=latent_dim,
        attr_spec=MNIST_SPEC,
        enc_plan=enc_plan,
        gen_plan=gen_plan,
        dx_plan=dx_plan,
        dz_plan=dz_plan,
        dxz_plan=dxz_plan,
        init_std=0.01,
        compute_dtype=compute_dtype,
        gen_input="spatial",
    )
