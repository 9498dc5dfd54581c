"""Morphometric measurement (area, length, thickness, slant, width, height).

API-compatible with the reference (``morphomnist/measure.py:10-138``):
``measure_image`` returns a :class:`Morphometrics` namedtuple;
``measure_batch`` maps over a batch, optionally with a process pool — the
host-side parallelism the reference uses (its only parallelism anywhere).
"""
from __future__ import annotations

import multiprocessing
from typing import NamedTuple, Optional

import numpy as np
import pandas as pd

from .morpho import ImageMoments, ImageMorphology, bounding_parallelogram


class Morphometrics(NamedTuple):
    area: float
    length: float
    thickness: float
    slant: float
    width: float
    height: float


def measure_image(
    image,
    threshold: float = 0.5,
    scale: int = 4,
    bound_frac: float = 0.02,
    verbose: bool = True,
) -> Morphometrics:
    image = np.asarray(image)
    morph = ImageMorphology(image, threshold, scale)
    moments = ImageMoments(morph.hires_image)
    area = morph.area
    length = morph.stroke_length
    thickness = morph.mean_thickness
    slant = float(np.arctan(-moments.horizontal_shear))

    corners = bounding_parallelogram(morph.hires_image, bound_frac, moments)
    width = (corners[1][0] - corners[0][0]) / morph.scale
    height = (corners[-1][1] - corners[0][1]) / morph.scale

    if verbose:
        print(
            f"area={area:.1f} length={length:.1f} thickness={thickness:.2f} "
            f"slant={np.rad2deg(slant):.0f}deg dims={width:.1f}x{height:.1f}"
        )
    return Morphometrics(area, length, thickness, slant, float(width), float(height))


def _measure_unpack(args):
    return measure_image(*args)


def measure_batch(
    images,
    threshold: float = 0.5,
    scale: int = 4,
    bound_frac: float = 0.02,
    pool: Optional[multiprocessing.pool.Pool] = None,
    chunksize: int = 100,
    engine: str = "auto",
) -> pd.DataFrame:
    """``engine="auto"`` uses the threaded C++ batch engine
    (``morphomnist/engine.py``) when its library builds, falling back to
    the per-image python path; ``engine="python"`` forces the fallback.
    Both produce identical values (shared deterministic thinning order)."""
    images = np.asarray(images)
    if engine not in ("auto", "native", "python"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "native" and pool is not None:
        raise ValueError("engine='native' uses its own thread pool; drop the pool arg")
    if engine in ("auto", "native") and pool is None:
        from . import engine as native_engine

        if native_engine.native_available():
            return native_engine.measure_batch_native(
                images, threshold=threshold, scale=scale, bound_frac=bound_frac
            )
        if engine == "native":
            raise RuntimeError("native morphometry engine unavailable")
    args = ((img, threshold, scale, bound_frac, False) for img in images)
    gen = map(_measure_unpack, args) if pool is None else pool.imap(
        _measure_unpack, args, chunksize=chunksize
    )
    try:
        import tqdm

        gen = tqdm.tqdm(gen, total=len(images), unit="img", ascii=True)
    except ImportError:
        pass
    return pd.DataFrame(list(gen))
