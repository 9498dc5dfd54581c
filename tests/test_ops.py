import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.ops.conv import (
    conv2d,
    conv_out_size,
    conv_transpose2d,
    conv_transpose_out_size,
)
from imagecfgen_tpu.ops.ssim import ssim


def test_conv_out_sizes_match_mnist_encoder_chain():
    # 28 -> 14 -> 7 -> 3 -> 1 -> 1 (reference image_scms/mnist.py:30-40)
    sizes = [28]
    for k, s, p in [(3, 2, 1), (4, 2, 1), (4, 2, 1), (4, 2, 1), (1, 2, 0)]:
        sizes.append(conv_out_size(sizes[-1], k, s, p))
    assert sizes == [28, 14, 7, 3, 1, 1]


def test_conv_transpose_out_sizes_match_mnist_generator_chain():
    # 1 -> 3 -> 7 -> 13 -> 25 -> 28 (reference image_scms/mnist.py:63-74)
    sizes = [1]
    for k, s, p in [(3, 1, 0), (3, 2, 0), (3, 2, 1), (3, 2, 1), (4, 1, 0)]:
        sizes.append(conv_transpose_out_size(sizes[-1], k, s, p))
    assert sizes == [1, 3, 7, 13, 25, 28]


def test_conv2d_shapes_and_values():
    x = jnp.ones((2, 28, 28, 1))
    w = jnp.ones((3, 3, 1, 4)) / 9.0
    y = conv2d(x, w, stride=2, padding=1)
    assert y.shape == (2, 14, 14, 4)
    # interior pixels average 9 ones
    assert np.allclose(np.asarray(y)[:, 5, 5, :], 1.0, atol=1e-6)


def test_conv_transpose2d_shape_chain():
    x = jnp.zeros((2, 1, 1, 771))
    chain = [(512, 3, 1, 0), (256, 3, 2, 0), (128, 3, 2, 1), (64, 3, 2, 1), (1, 4, 1, 0)]
    expected = [3, 7, 13, 25, 28]
    for (f, k, s, p), e in zip(chain, expected):
        w = jnp.zeros((k, k, x.shape[-1], f))
        x = conv_transpose2d(x, w, stride=s, padding=p)
        assert x.shape[1] == e and x.shape[2] == e, (x.shape, e)


def test_conv_transpose_is_adjoint_of_conv():
    # <conv(x), y> == <x, conv_T(y)> for p=0 — the defining property.
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (1, 8, 8, 2))
    w = jax.random.normal(k2, (3, 3, 2, 5))
    y = jax.random.normal(k3, (1, 6, 6, 5))
    fwd = conv2d(x, w, stride=1, padding=0)
    assert fwd.shape == y.shape
    lhs = jnp.sum(fwd * y)
    # adjoint: conv_transpose with flipped kernel, swapped io
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    bwd = conv_transpose2d(y, w_t, stride=1, padding=0)
    assert bwd.shape == x.shape
    rhs = jnp.sum(bwd * x)
    assert np.allclose(lhs, rhs, rtol=1e-4)


def test_ssim_identity_and_range():
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (3, 28, 28, 1))
    assert np.allclose(float(ssim(x, x)), 1.0, atol=1e-5)
    y = jnp.zeros_like(x)
    v = float(ssim(x, y))
    assert -1.0 <= v < 0.9


def test_ssim_decreases_with_noise():
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (2, 32, 32, 1))
    n1 = x + 0.05 * jax.random.normal(jax.random.PRNGKey(3), x.shape)
    n2 = x + 0.5 * jax.random.normal(jax.random.PRNGKey(4), x.shape)
    assert float(ssim(x, n1)) > float(ssim(x, n2))
