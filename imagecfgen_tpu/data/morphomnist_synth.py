"""Morpho-MNIST dataset synthesis with the ground-truth SCM.

Reference semantics (``create_train_dataset.py:20-104``):

- ground-truth SCM:  t = Gamma(10, rate 5) + 0.5;
  i = 191 * sigmoid(0.5*e_i + 2*t - 5) + 64, e_i ~ N(0,1);
  s = pi * N(0, 0.1);
- per image: SetThickness(t) at 16x upscale, re-morph, SetSlant(s),
  downscale, then rescale pixel values so the median bright intensity
  equals i;
- emits ``mnist-x-train.npy`` (N, 28, 28) float32 and ``mnist-a-train.npy``
  (N, 13) = [one-hot digit(10), t, i, s].

Synthesis is host-side (morphology oracle) and parallelised over a process
pool — the measurement pipeline's natural parallelism.
"""
from __future__ import annotations

import dataclasses
import multiprocessing
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..morphomnist.morpho import ImageMorphology
from ..morphomnist.perturb import SetSlant, SetThickness


@dataclasses.dataclass
class GroundTruthSCM:
    """The closed-form data-generating SCM for Morpho-MNIST attributes."""

    rng: np.random.Generator

    def sample_thickness(self, n: int, noise: Optional[np.ndarray] = None) -> np.ndarray:
        et = self.rng.gamma(10.0, 1.0 / 5.0, (n, 1)) if noise is None else noise
        return (et + 0.5).astype(np.float32)

    def sample_slant(self, n: int, noise: Optional[np.ndarray] = None) -> np.ndarray:
        es = self.rng.normal(0.0, 0.1, (n, 1)) if noise is None else noise
        return (np.pi * es).astype(np.float32)

    def sample_intensity(self, t: np.ndarray, noise: Optional[np.ndarray] = None) -> np.ndarray:
        ei = self.rng.normal(0.0, 1.0, t.shape) if noise is None else noise
        return (191.0 / (1.0 + np.exp(-(0.5 * ei + 2.0 * t - 5.0))) + 64.0).astype(
            np.float32
        )

    def sample(self, n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        t = self.sample_thickness(n)
        i = self.sample_intensity(t)
        s = self.sample_slant(n)
        return t, i, s


def perturb_image(
    image: np.ndarray, thickness: float, intensity: float, slant: float, scale: int = 16
) -> np.ndarray:
    """Apply SetThickness -> SetSlant -> intensity rescale to one digit."""
    morph = ImageMorphology(image.reshape(28, 28), scale=scale)
    thick = np.float32(SetThickness(thickness)(morph))
    hires = np.float32(SetSlant(slant)(ImageMorphology(thick)))
    img = morph.downscale(hires)

    img_min, img_max = img.min(), img.max()
    if img_max > img_min:
        current = np.median(img[img >= img_min + (img_max - img_min) * 0.5])
        img = np.clip(img * (intensity / max(current, 1e-6)), 0, 255)
    return img.astype(np.float32)


def _perturb_unpack(args):
    return perturb_image(*args)


def synthesize_dataset(
    images: np.ndarray,
    labels: np.ndarray,
    seed: int = 0,
    scale: int = 16,
    pool: Optional[multiprocessing.pool.Pool] = None,
    attrs: Optional[Dict[str, np.ndarray]] = None,
    progress: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (x (N,28,28) float32, a (N,13) float32) in the reference's
    column layout. ``attrs`` may supply pre-drawn thickness/intensity/slant
    (the test-set script reuses DeepSCM-provided values —
    ``create_test_dataset.py:94-109``)."""
    n = len(images)
    scm = GroundTruthSCM(np.random.default_rng(seed))
    if attrs is None:
        t, i, s = scm.sample(n)
    else:
        t = np.asarray(attrs["thickness"], np.float32).reshape(n, 1)
        i = np.asarray(attrs["intensity"], np.float32).reshape(n, 1)
        s = np.asarray(attrs["slant"], np.float32).reshape(n, 1)

    args = (
        (images[k], float(t[k, 0]), float(i[k, 0]), float(s[k, 0]), scale)
        for k in range(n)
    )
    gen = map(_perturb_unpack, args) if pool is None else pool.imap(
        _perturb_unpack, args, chunksize=64
    )
    if progress:
        import tqdm

        gen = tqdm.tqdm(gen, total=n, unit="img", ascii=True)

    x = np.stack(list(gen), axis=0)
    a = np.zeros((n, 13), dtype=np.float32)
    a[np.arange(n), np.asarray(labels, int)] = 1.0
    a[:, 10] = t[:, 0]
    a[:, 11] = i[:, 0]
    a[:, 12] = s[:, 0]
    return x, a
