"""Batched native morphometry engine (ctypes front-end).

Wraps ``native/morphometry.cpp``: exact EDT + deterministic medial-axis
thinning + fused metric reductions, threaded over the batch in C++. The
per-pixel removal order is bit-identical with the numpy path in
``_skeletonize.medial_axis`` (shared splitmix64 tiebreak), so the two
implementations produce the same skeletons and hence the same metrics.

``measure_batch_native`` is the fast path behind
``measure.measure_batch`` — the reference parallelises this with a
``multiprocessing.Pool`` over whole-Python per-image work
(reference ``morphomnist/measure.py:119-122``); here upsampling runs in a
GIL-releasing scipy thread pool and everything after binarisation is one
native call.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from ._skeletonize import _removal_table
from .morpho import ImageMoments, bounding_parallelogram, pyramid_expand


@lru_cache(maxsize=1)
def _native_lib():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "morphometry.cpp")
    so = os.path.join(root, "native", "libmorphometry.so")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", so, src],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.morphometry_batch.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            u8p, f64p, u8p, f64p, ctypes.c_int32,
        ]
        return lib
    except Exception:
        return None


def native_available() -> bool:
    return _native_lib() is not None


def _as_u8p(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.POINTER(ctypes.c_uint8)()
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _as_f64p(a: Optional[np.ndarray]):
    if a is None:
        return ctypes.POINTER(ctypes.c_double)()
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def morphometry_batch(
    binary: np.ndarray,
    want_distance: bool = False,
    want_skeleton: bool = False,
    want_metrics: bool = True,
    n_threads: Optional[int] = None,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
    """EDT + skeleton + metrics for a (B, H, W) binary batch.

    Returns (distance (B,H,W) f64 | None, skeleton (B,H,W) bool | None,
    metrics (B,4) f64 [area_px, stroke_len_px, mean_skel_dist, skel_count]
    | None). Requires the native library; callers check
    :func:`native_available` first.
    """
    lib = _native_lib()
    if lib is None:
        raise RuntimeError("native morphometry library unavailable")
    binary = np.ascontiguousarray(binary.astype(np.uint8))
    b, h, w = binary.shape
    dist = np.empty((b, h, w), np.float64) if want_distance else None
    skel = np.empty((b, h, w), np.uint8) if want_skeleton else None
    metrics = np.empty((b, 4), np.float64) if want_metrics else None
    table = np.ascontiguousarray(_removal_table())
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, b)
    lib.morphometry_batch(
        _as_u8p(binary), np.int32(b), np.int32(h), np.int32(w),
        _as_u8p(table), _as_f64p(dist), _as_u8p(skel), _as_f64p(metrics),
        np.int32(n_threads),
    )
    return dist, (skel.astype(bool) if skel is not None else None), metrics


def measure_batch_native(
    images: np.ndarray,
    threshold: float = 0.5,
    scale: int = 4,
    bound_frac: float = 0.02,
    workers: Optional[int] = None,
    chunk: int = 256,
):
    """Morphometrics table for a batch, matching ``measure_image`` values.

    Upsampling (scipy zoom+gaussian, GIL-releasing) runs in a thread pool;
    EDT/skeleton/area/length/thickness run in the C++ engine; moments and
    the bounding parallelogram (cheap) run per-image in numpy.
    """
    import pandas as pd

    images = np.asarray(images)
    n = len(images)
    workers = workers or min(os.cpu_count() or 1, 16)

    def upsample(img):
        if scale > 1:
            up = pyramid_expand(img / max(img.max(), 1e-12), upscale=scale)
            return (255.0 * np.clip(up, 0.0, 1.0)).astype(img.dtype)
        return img

    rows = []
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for lo in range(0, n, chunk):
            batch = images[lo : lo + chunk]
            hires = list(pool.map(upsample, batch))
            mn = [float(im.min()) for im in hires]
            mx = [float(im.max()) for im in hires]
            binary = np.stack(
                [
                    im >= lo_ + (hi_ - lo_) * threshold
                    for im, lo_, hi_ in zip(hires, mn, mx)
                ]
            )
            _, _, metrics = morphometry_batch(binary, n_threads=workers)

            def tail_metrics(args):
                im, (area_px, length_px, mean_d, _count) = args
                moments = ImageMoments(im)
                slant = float(np.arctan(-moments.horizontal_shear))
                corners = bounding_parallelogram(im, bound_frac, moments)
                width = (corners[1][0] - corners[0][0]) / scale
                height = (corners[-1][1] - corners[0][1]) / scale
                return (
                    area_px / scale**2,
                    length_px / scale,
                    2.0 * mean_d / scale,
                    slant,
                    float(width),
                    float(height),
                )

            rows.extend(pool.map(tail_metrics, zip(hires, metrics)))
    return pd.DataFrame(
        rows, columns=["area", "length", "thickness", "slant", "width", "height"]
    )
