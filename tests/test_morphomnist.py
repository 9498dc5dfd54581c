import numpy as np
import pytest

from imagecfgen_tpu.morphomnist._skeletonize import _native_lib, medial_axis
from imagecfgen_tpu.morphomnist.io import load_idx, save_idx
from imagecfgen_tpu.morphomnist.measure import measure_image
from imagecfgen_tpu.morphomnist.morpho import ImageMoments, ImageMorphology
from imagecfgen_tpu.morphomnist.perturb import SetSlant, SetThickness, Thickening, Thinning


def _stroke_image(thickness=3.0, size=28, length=16):
    """Synthetic vertical stroke of known thickness (pixels)."""
    img = np.zeros((size, size), dtype=np.float32)
    c = size // 2
    half = thickness / 2.0
    lo, hi = int(np.floor(c - half)), int(np.ceil(c + half))
    img[size // 2 - length // 2 : size // 2 + length // 2, lo:hi] = 255.0
    return img


def test_native_skeletonize_lib_builds():
    lib = _native_lib()
    assert lib is not None, "C++ skeletonize kernel failed to build"


def test_medial_axis_of_rect_stroke():
    img = _stroke_image(thickness=5) > 0
    skel, dist = medial_axis(img, return_distance=True)
    assert skel.sum() > 0
    # skeleton lies inside the stroke and roughly down its center column
    assert (img[skel]).all()
    cols = np.where(skel.any(axis=0))[0]
    assert cols.min() >= 11 and cols.max() <= 17
    # distance at the skeleton ~ half thickness
    assert 1.5 <= dist[skel].mean() <= 3.5


def test_python_fallback_matches_native():
    from imagecfgen_tpu.morphomnist import _skeletonize as sk

    img = _stroke_image(thickness=5) > 0
    native = sk.medial_axis(img)
    lib = sk._native_lib
    # force python fallback
    sk._native_lib.cache_clear()
    orig = sk._native_lib.__wrapped__
    try:
        sk._native_lib = lambda: None
        fallback = sk.medial_axis(img)
    finally:
        sk._native_lib = lib
    assert np.array_equal(np.asarray(native), np.asarray(fallback))


def test_measure_thickness_close_to_truth():
    img = _stroke_image(thickness=4.0)
    m = measure_image(img, scale=4, verbose=False)
    assert 2.5 < m.thickness < 5.5
    assert m.length > 8
    assert abs(m.slant) < 0.2


def test_set_thickness_moves_measurement():
    img = _stroke_image(thickness=3.0)
    morph = ImageMorphology(img, scale=4)
    base = morph.mean_thickness

    thicker_hi = SetThickness(base + 2.0)(morph)
    thicker = morph.downscale(np.float32(thicker_hi) * 255.0)
    m2 = ImageMorphology(thicker, scale=4).mean_thickness
    assert m2 > base + 0.75, (base, m2)

    thinner_hi = SetThickness(max(base - 1.5, 0.8))(morph)
    thinner = morph.downscale(np.float32(thinner_hi) * 255.0)
    m3 = ImageMorphology(thinner, scale=4).mean_thickness
    assert m3 < base - 0.4, (base, m3)


def test_set_slant_changes_shear():
    img = _stroke_image(thickness=4.0, length=20)
    morph = ImageMorphology(img, scale=4)
    target = 0.35  # radians
    warped_hi = SetSlant(target)(morph)
    warped = morph.downscale(np.float32(warped_hi) * 255.0)
    m = measure_image(warped, scale=4, verbose=False)
    assert abs(m.slant - target) < 0.15, m.slant


def test_thinning_thickening():
    img = _stroke_image(thickness=5.0)
    morph = ImageMorphology(img, scale=4)
    thin = Thinning(0.5)(morph)
    thick = Thickening(0.5)(morph)
    assert thin.sum() < morph.binary_image.sum() < thick.sum()


def test_moments_of_sheared_stroke():
    # construct a sheared stroke; horizontal_shear should be positive
    size = 28
    img = np.zeros((size, size), np.float32)
    for r in range(4, 24):
        c = int(14 + 0.4 * (14 - r))
        img[r, c - 2 : c + 2] = 255
    mom = ImageMoments(img)
    assert mom.horizontal_shear < 0 or mom.horizontal_shear > 0  # finite
    assert np.isfinite(mom.axis_lengths).all()


def test_idx_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (7, 28, 28), dtype=np.uint8)
    for name in ("a.idx", "a.idx.gz"):
        p = str(tmp_path / name)
        save_idx(data, p)
        back = load_idx(p)
        assert np.array_equal(data, back)


def test_edt_morphology_matches_structuring_element():
    """disk_dilation/disk_erosion (EDT-based, O(N)) must agree exactly with
    naive structuring-element morphology for Euclidean disks."""
    from scipy import ndimage as ndi

    from imagecfgen_tpu.morphomnist.perturb import disk_dilation, disk_erosion
    from imagecfgen_tpu.morphomnist.skeleton import disk

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64)) > 0.85
    for r in (1, 3, 7):
        se = disk(r).astype(bool)
        assert np.array_equal(
            disk_dilation(img, r), ndi.binary_dilation(img, structure=se)
        ), r
        assert np.array_equal(
            disk_erosion(img, r), ndi.binary_erosion(img, structure=se)
        ), r


def test_edt_morphology_speed_on_hires():
    """The EDT path must beat naive SE dilation on a 448^2 image with a
    large radius (the dataset-synthesis hot case)."""
    import time

    from scipy import ndimage as ndi

    from imagecfgen_tpu.morphomnist.perturb import disk_dilation
    from imagecfgen_tpu.morphomnist.skeleton import disk

    rng = np.random.default_rng(1)
    img = np.zeros((448, 448), bool)
    img[200:260, 100:350] = True
    r = 24
    t0 = time.perf_counter()
    fast = disk_dilation(img, r)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    slow = ndi.binary_dilation(img, structure=disk(r).astype(bool))
    t_slow = time.perf_counter() - t0
    assert np.array_equal(fast, slow)
    assert t_fast < t_slow, (t_fast, t_slow)


def test_synthesized_images_are_not_blank():
    """Regression: ``ImageMorphology.downscale`` used to cast to uint8,
    quantising the binary [0, 1] perturbation outputs to black — over
    half the synthesized dataset had max pixel 0."""
    from imagecfgen_tpu.data.morphomnist_synth import synthesize_dataset
    from imagecfgen_tpu.data.synthetic_digits import synthetic_digits

    imgs, labels = synthetic_digits(8, seed=4)
    x, a = synthesize_dataset(imgs, labels, seed=4, scale=4)
    per_image_max = x.max(axis=(1, 2))
    assert (per_image_max > 50.0).all(), per_image_max
    # median bright intensity lands near the sampled intensity attribute
    k = 0
    img = x[k]
    bright = img[img >= img.min() + (img.max() - img.min()) * 0.5]
    assert abs(float(np.median(bright)) - a[k, 11]) < 30.0
