"""Plotting helpers for digits, grids and measured geometry
(API parity with the reference ``morphomnist/util.py``: plot_digit,
plot_grid, plot_ellipse, plot_parallelogram)."""
from __future__ import annotations

import numpy as np


def plot_digit(img, ax=None, title: str = "", **imshow_kwargs):
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    ax.imshow(np.asarray(img), cmap="gray_r", **imshow_kwargs)
    ax.axis("off")
    if title:
        ax.set_title(title)
    return ax


def plot_grid(images, n_cols: int = 10, figsize=None, titles=None):
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    n = len(images)
    n_rows = (n + n_cols - 1) // n_cols
    fig, axes = plt.subplots(
        n_rows, n_cols, figsize=figsize or (1.2 * n_cols, 1.3 * n_rows), squeeze=False
    )
    for i in range(n_rows * n_cols):
        ax = axes[i // n_cols, i % n_cols]
        if i < n:
            ax.imshow(images[i], cmap="gray_r")
            if titles is not None:
                ax.set_title(str(titles[i]), fontsize=8)
        ax.axis("off")
    return fig, axes


def plot_ellipse(moments, ax, scale: float = 2.0, **kwargs):
    """Draw the second-moment ellipse of an :class:`ImageMoments`."""
    import matplotlib.patches as mpatches

    cx, cy = moments.centroid
    a, b = moments.axis_lengths
    angle_deg = np.rad2deg(moments.angle)
    ell = mpatches.Ellipse(
        (cx, cy), 2 * scale * a, 2 * scale * b, angle=angle_deg,
        fill=False, **kwargs,
    )
    ax.add_patch(ell)
    return ell


def plot_parallelogram(corners, ax, **kwargs):
    """Draw the bounding parallelogram returned by
    :func:`morpho.bounding_parallelogram` (corners clockwise)."""
    import matplotlib.patches as mpatches

    poly = mpatches.Polygon(np.asarray(corners), closed=True, fill=False, **kwargs)
    ax.add_patch(poly)
    return poly
