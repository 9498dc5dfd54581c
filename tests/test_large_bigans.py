"""Shape checks for the 256^2 whale and 512^2 ESRF topologies (shrunk d)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.models.bigan import BiGAN, esrf_bigan_config, whale_bigan_config
from imagecfgen_tpu.ops.conv import conv_out_size, conv_transpose_out_size


def test_whale_conv_chains():
    # encoder: 256 -> 127 -> 63 -> 31 -> 15 -> 7 -> 3 -> 1
    s = 256
    for _ in range(7):
        s = conv_out_size(s, 5, 2, 1)
    assert s == 1
    # generator: 4 -> 8 -> ... -> 256 (k5 s2 p2 outpad1 doubles)
    s = 4
    for _ in range(6):
        s = conv_transpose_out_size(s, 5, 2, 2, 1)
    assert s == 256


def test_esrf_conv_chains():
    s = 512
    for _ in range(8):
        s = conv_out_size(s, 5, 2, 1)
    assert s == 1
    s = 4
    for _ in range(7):
        s = conv_transpose_out_size(s, 5, 2, 2, 1)
    assert s == 512


def test_whale_bigan_shapes_small():
    cfg = whale_bigan_config(d=4, latent_dim=16)
    model = BiGAN(cfg)
    b = 2
    x = jnp.zeros((b, 256, 256, 1))
    z = jnp.zeros((b, 1, 1, 16))
    attrs = {"call_type": jnp.asarray(np.eye(3, dtype=np.float32)[[0, 2]])}
    key = jax.random.PRNGKey(0)
    ex = model.encoder.apply(model.encoder.init({"params": key}, x, attrs), x, attrs)
    assert ex.shape == (b, 1, 1, 16)
    gz = model.generator.apply(model.generator.init({"params": key}, z, attrs), z, attrs)
    assert gz.shape == (b, 256, 256, 1)
    vD = model.discriminator.init({"params": key}, x, z, attrs, train=False)
    d = model.discriminator.apply(vD, x, z, attrs, train=False)
    assert d.shape == (b, 1)


def test_esrf_bigan_shapes_small():
    cfg = esrf_bigan_config(d=2, latent_dim=8)
    model = BiGAN(cfg)
    b = 2
    x = jnp.zeros((b, 512, 512, 1))
    z = jnp.zeros((b, 1, 1, 8))
    attrs = {
        "has_boat": jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1]]),
        "closest_boat": jnp.asarray(np.float32([0.3, -0.7])),
    }
    key = jax.random.PRNGKey(0)
    ex = model.encoder.apply(model.encoder.init({"params": key}, x, attrs), x, attrs)
    assert ex.shape == (b, 1, 1, 8)
    gz = model.generator.apply(model.generator.init({"params": key}, z, attrs), z, attrs)
    assert gz.shape == (b, 512, 512, 1)
    vD = model.discriminator.init({"params": key}, x, z, attrs, train=False)
    d = model.discriminator.apply(vD, x, z, attrs, train=False)
    assert d.shape == (b, 1)
