"""Batched C++ morphometry engine vs the numpy reference path.

The two implementations share the deterministic thinning order
(splitmix64 tiebreak — ``_skeletonize.py`` / ``native/morphometry.cpp``),
so skeletons must match exactly and metrics to float-sum tolerance.
"""
import numpy as np
import pytest

from imagecfgen_tpu.data.synthetic_digits import synthetic_digits
from imagecfgen_tpu.morphomnist import _skeletonize, measure
from imagecfgen_tpu.morphomnist import engine as native_engine
from imagecfgen_tpu.morphomnist.morpho import (
    ImageMoments,
    bounding_parallelogram,
    pyramid_expand,
)

needs_native = pytest.mark.skipif(
    not native_engine.native_available(), reason="native library did not build"
)


def _hires_binary(img, scale=4, threshold=0.5):
    hi = np.clip(pyramid_expand(img / img.max(), scale), 0, 1)
    return hi, hi >= threshold


@needs_native
def test_native_medial_axis_matches_python():
    imgs, _ = synthetic_digits(4, seed=11)
    for img in imgs:
        _, binary = _hires_binary(img)
        skel_nat, dist_nat = _skeletonize.medial_axis(binary, return_distance=True)
        # force the numpy fallback
        orig = native_engine.native_available
        native_engine.native_available = lambda: False
        try:
            skel_py, dist_py = _skeletonize.medial_axis(binary, return_distance=True)
        finally:
            native_engine.native_available = orig
        assert (skel_nat == skel_py).all()
        assert np.abs(dist_nat - dist_py).max() == 0.0  # both sqrt of exact ints


@needs_native
def test_native_measure_batch_matches_python():
    imgs, _ = synthetic_digits(8, seed=12)
    df_nat = measure.measure_batch(imgs, engine="auto")
    df_py = measure.measure_batch(imgs, engine="python")
    np.testing.assert_allclose(
        df_nat.to_numpy(), df_py.to_numpy(), rtol=0, atol=1e-9
    )


@needs_native
def test_native_edt_matches_scipy():
    from scipy import ndimage as ndi

    rng = np.random.default_rng(0)
    binary = rng.random((64, 80)) > 0.4
    dist, skel, metrics = native_engine.morphometry_batch(
        binary[None], want_distance=True, want_skeleton=True
    )
    np.testing.assert_array_equal(dist[0], ndi.distance_transform_edt(binary))
    # metrics row = [area_px, stroke_len_px, mean_skel_dist, skel_count]
    assert metrics[0, 0] == binary.sum()
    assert metrics[0, 3] == skel[0].sum()


def test_bounding_parallelogram_matches_direct_scan():
    """The O(HW) binned CDF must reproduce the reference's per-offset scan
    (reference morphomnist/morpho.py:178-233)."""
    imgs, _ = synthetic_digits(3, seed=13)
    for img in imgs:
        hi, _ = _hires_binary(img)
        m = ImageMoments(hi)
        got = np.array(bounding_parallelogram(hi, 0.02, m))

        f = np.asarray(hi, float)
        h, w = f.shape
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        y_mid = m.centroid[1]
        shear = m.horizontal_shear
        total = f.sum()
        sheared_x = x + 0.5 - shear * (y - y_mid)
        hcdf = np.array([((sheared_x < t) * f).sum() for t in range(w)]) / total
        vcdf = np.array([((y < t) * f).sum() for t in range(h)]) / total
        frac = 0.01
        left, right = np.interp([frac, 1 - frac], hcdf, np.arange(w))
        top, bottom = np.interp([frac, 1 - frac], vcdf, np.arange(h))
        want = np.array(
            [
                [left + shear * (top - y_mid), top],
                [right + shear * (top - y_mid), top],
                [right + shear * (bottom - y_mid), bottom],
                [left + shear * (bottom - y_mid), bottom],
            ]
        )
        np.testing.assert_allclose(got, want, atol=1e-8)
