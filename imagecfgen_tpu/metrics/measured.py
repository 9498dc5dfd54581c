"""Morphometric CF-parity helpers: measure generated images with the
morphometry oracle and compare against intervention targets.

Backs the reference's measured-CF scripts (``mnist_gan_measured_cf.py:
91-133``, ``mnist_vae_measured_cf.py:156-262``): regenerate under
do(attr), measure thickness/intensity/slant of the generated image, and
report target-vs-measured scatter and median absolute error.
"""
from __future__ import annotations

import multiprocessing
from typing import Dict, Optional, Tuple

import numpy as np

from ..morphomnist.measure import measure_image


def measure_attributes_single(image255: np.ndarray, scale: int = 4) -> Tuple[float, float, float]:
    """(thickness, intensity, slant) of a [0,255] 28x28 image; intensity is
    the median bright-pixel value (``create_train_dataset.py:82-84``)."""
    img = np.asarray(image255, np.float64)
    m = measure_image(img, scale=scale, verbose=False)
    lo, hi = img.min(), img.max()
    bright = img[img >= lo + (hi - lo) * 0.5]
    intensity = float(np.median(bright)) if bright.size else 0.0
    return float(m.thickness), intensity, float(m.slant)


def _measure_unpack(args):
    return measure_attributes_single(*args)


def measure_attributes(
    images255: np.ndarray,
    scale: int = 4,
    pool: Optional[multiprocessing.pool.Pool] = None,
) -> np.ndarray:
    """(N, 3) array of (thickness, intensity, slant)."""
    args = ((img, scale) for img in images255)
    gen = map(_measure_unpack, args) if pool is None else pool.imap(
        _measure_unpack, args, chunksize=32
    )
    return np.asarray(list(gen), np.float64)


def images_to_255(x: np.ndarray) -> np.ndarray:
    """[-1,1] NHWC model output -> [0,255] (N,28,28)."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[..., 0]
    return 255.0 * (x + 1.0) / 2.0


def median_abs_errors(targets: Dict[str, np.ndarray], measured: np.ndarray) -> Dict[str, float]:
    names = ("thickness", "intensity", "slant")
    return {
        k: float(np.median(np.abs(np.asarray(targets[k]).reshape(-1) - measured[:, i])))
        for i, k in enumerate(names)
        if k in targets
    }
