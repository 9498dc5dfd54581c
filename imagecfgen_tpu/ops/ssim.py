"""Jitted SSIM (structural similarity), NHWC.

Replaces the reference's dependency on ``pytorch_msssim.ssim``
(``image_scms/training_utils.py:95-97``, ``finetune_mnist_bigan.py:76``):
an 11x11 Gaussian-window SSIM with the standard constants, implemented with
two separable depthwise convolutions so XLA fuses the whole computation.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def _blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of an NHWC tensor (valid padding)."""
    c = x.shape[-1]
    kh = jnp.tile(win.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # HWIO, depthwise
    kw = jnp.tile(win.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dims = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dims, feature_group_count=c
    )
    x = lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dims, feature_group_count=c
    )
    return x


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM between NHWC batches ``x`` and ``y``.

    Returns a scalar if ``size_average`` else a per-image ``(B,)`` vector.
    """
    win = _gaussian_kernel(win_size, win_sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur(x * x, win) - mu_xx
    sigma_yy = _blur(y * y, win) - mu_yy
    sigma_xy = _blur(x * y, win) - mu_xy

    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    per_image = ssim_map.mean(axis=(1, 2, 3))
    return per_image.mean() if size_average else per_image
