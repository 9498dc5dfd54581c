"""Medial-axis skeletonization (scikit-image-compatible algorithm).

The algorithm: pixels of the binary image are visited in increasing order of
(distance-to-boundary, cornerness, tiebreak) and removed unless removal
would change local 8-connectivity or the pixel has fewer than 3 neighbours.
The per-pixel visit is inherently sequential, so the inner loop runs in C++
(``native/skeletonize.cpp``) with a pure-python fallback.

Determinism: unlike scikit-image's default (unseeded random tiebreak), the
tiebreaker here is splitmix64 of the pixel's linear index — a fixed
bijection, so the visit order is a strict total order that the batched C++
engine (``native/morphometry.cpp``) reproduces exactly.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np
from scipy import ndimage as ndi

_NBH_WEIGHTS = np.array([[1, 2, 4], [8, 16, 32], [64, 128, 256]], dtype=np.int32)
_EIGHT = np.ones((3, 3), dtype=int)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 over a uint64 array — a bijection, so distinct linear
    indices get distinct tiebreak keys (same constants as the C++ engine)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _pattern(index: int) -> np.ndarray:
    bits = [(index >> b) & 1 for b in range(9)]
    return np.array(bits, dtype=bool).reshape(3, 3)


@lru_cache(maxsize=1)
def _removal_table() -> np.ndarray:
    """table[idx] == True  ->  keep the pixel (removal would break topology
    or the pixel is an endpoint)."""
    keep = np.zeros(512, dtype=np.uint8)
    for idx in range(512):
        if not (idx & 16):  # center must be foreground
            continue
        pat = _pattern(idx)
        pat_wo = pat.copy()
        pat_wo[1, 1] = False
        n_with = ndi.label(pat, _EIGHT)[1]
        n_without = ndi.label(pat_wo, _EIGHT)[1]
        if n_with != n_without or pat.sum() < 3:
            keep[idx] = 1
    return keep


@lru_cache(maxsize=1)
def _native_lib():
    """Load (building if necessary) the C++ skeletonize loop."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "skeletonize.cpp")
    so = os.path.join(root, "native", "libskeletonize.so")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.skeletonize_loop.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        return lib
    except Exception:
        return None


def _loop_python(img: np.ndarray, ii, jj, order, table) -> None:
    h, w = img.shape
    for o in order:
        i, j = int(ii[o]), int(jj[o])
        idx = 0
        bit = 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                y, x = i + di, j + dj
                if 0 <= y < h and 0 <= x < w and img[y, x]:
                    idx |= 1 << bit
                bit += 1
        if not table[idx]:
            img[i, j] = 0


def medial_axis(binary: np.ndarray, return_distance: bool = False, seed: int = 0):
    """Medial-axis skeleton of a 2-D binary image (+ distance map).

    Routes through the batched C++ engine when available (identical
    result — see module docstring); the numpy path below is the fallback
    and the executable spec."""
    binary = np.ascontiguousarray(binary.astype(bool))

    try:
        from . import engine

        if engine.native_available():
            dist, skel, _ = engine.morphometry_batch(
                binary[None],
                want_distance=return_distance,
                want_skeleton=True,
                want_metrics=False,
            )
            if return_distance:
                return skel[0], dist[0]
            return skel[0]
    except Exception:
        pass

    distance = ndi.distance_transform_edt(binary)

    table = _removal_table()
    # cornerness: fewer neighbours == more cornery, processed later
    nbh_count = ndi.correlate(
        binary.astype(np.int32), np.ones((3, 3), np.int32), mode="constant"
    )
    corner_score = 9 - nbh_count

    fg = binary
    ii, jj = np.nonzero(fg)
    n = len(ii)
    tiebreak = _splitmix64(
        (ii.astype(np.uint64) * np.uint64(binary.shape[1]) + jj.astype(np.uint64))
    )
    order = np.lexsort((tiebreak, corner_score[fg], distance[fg])).astype(np.int32)

    img = np.ascontiguousarray(binary.astype(np.uint8))
    ii32 = np.ascontiguousarray(ii.astype(np.int32))
    jj32 = np.ascontiguousarray(jj.astype(np.int32))

    lib = _native_lib()
    if lib is not None:
        lib.skeletonize_loop(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            np.int32(img.shape[0]),
            np.int32(img.shape[1]),
            ii32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            jj32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int32(n),
            table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    else:
        _loop_python(img, ii32, jj32, order, table)

    skel = img.astype(bool)
    if return_distance:
        return skel, distance
    return skel
