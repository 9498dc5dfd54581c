"""Morpho-MNIST measurement & perturbation library (host-side oracle).

API-compatible rebuild of the vendored ``morphomnist`` package in the
reference (``morphomnist/{morpho,measure,perturb,skeleton,io}.py``) — the
measurement oracle that defines ground-truth morphometrics (area, stroke
length, thickness, slant, width, height) and the SCM dataset perturbations
(SetThickness / SetSlant / SetIntensity, ...).

This environment has no scikit-image, so the morphological core (medial-axis
skeletonization, Gaussian pyramid rescaling, disk morphology, warps) is
implemented from scratch on numpy/scipy, with the sequential medial-axis
thinning loop in native C++ (``native/skeletonize.cpp``) because it is the
one genuinely serial hot spot (the reference parallelises measurement with a
process pool — ``morphomnist/measure.py:119-122`` — which we keep).

Measurement stays on the host by design: it is an *offline oracle* used for
dataset synthesis and metric parity, not a training-path op (SURVEY §2.9).
"""
from .morpho import ImageMorphology, ImageMoments, bounding_parallelogram
from .measure import Morphometrics, measure_batch, measure_image
from .io import load_idx, save_idx
