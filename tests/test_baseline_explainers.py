"""Tests for the from-scratch OmnixAI-equivalent pixel baselines
(Wachter counterfactuals + CEM pertinent negatives/positives,
``imagecfgen_tpu/cf/baselines.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.cf.baselines import PixelBaselineExplainers


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

    def classify(x):
        return x.reshape(x.shape[0], -1) @ w

    x = jnp.asarray(np.clip(rng.normal(0, 0.5, size=(6, 8, 8, 1)), -1, 1).astype(np.float32))
    ex = PixelBaselineExplainers(classify, steps=150, lr=0.05)
    return ex, classify, x


def test_counterfactual_flips_and_stays_close(setup):
    ex, classify, x = setup
    orig = jnp.argmax(classify(x), -1)
    cf, ok = ex.counterfactual(x)
    assert bool(ok.all()), "every example should admit a pixel CF"
    new = jnp.argmax(classify(cf), -1)
    assert bool((new != orig).all())
    # bounds respected
    assert float(cf.min()) >= -1.0 - 1e-6 and float(cf.max()) <= 1.0 + 1e-6
    # sparser than a wholesale image replacement: L1 well under the
    # distance to a random other image of the same scale
    l1 = jnp.abs(cf - x).sum(axis=(1, 2, 3))
    assert float(l1.max()) < 0.5 * float(jnp.abs(x).sum(axis=(1, 2, 3)).mean())


def test_contrastive_pn_flips_pp_keeps(setup):
    ex, classify, x = setup
    orig = jnp.argmax(classify(x), -1)
    pn, pn_ok, pp, pp_ok = ex.contrastive(x)
    assert bool(pn_ok.all()) and bool(pp_ok.all())
    assert bool((jnp.argmax(classify(pn), -1) != orig).all())
    assert bool((jnp.argmax(classify(pp), -1) == orig).all())
    # PN stays in the data range; PP is a sub-part of x (elementwise
    # between 0 and x, so |pp| <= |x| and same sign where nonzero)
    assert float(pn.min()) >= -1.0 - 1e-6 and float(pn.max()) <= 1.0 + 1e-6
    assert bool((jnp.abs(pp) <= jnp.abs(x) + 1e-6).all())
    assert bool((pp * x >= -1e-6).all())
    # PN perturbation is sparse-ish: elastic-net beats replacing the image
    assert float(jnp.abs(pn - x).sum()) < float(jnp.abs(x).sum())


def test_unflippable_input_reports_failure():
    # a constant classifier can never flip: ok must be False and the
    # explainer must return the input unchanged rather than garbage
    def classify(x):
        base = jnp.zeros((x.shape[0], 3))
        return base.at[:, 0].set(1.0) + 0.0 * x.reshape(x.shape[0], -1).sum(-1, keepdims=True)

    x = jnp.zeros((2, 4, 4, 1))
    ex = PixelBaselineExplainers(classify, steps=20, lr=0.1, c_values=(1.0,))
    cf, ok = ex.counterfactual(x)
    assert not bool(ok.any())
    np.testing.assert_allclose(np.asarray(cf), np.asarray(x))
    pn, pn_ok, pp, pp_ok = ex.contrastive(x)
    assert not bool(pn_ok.any())
    np.testing.assert_allclose(np.asarray(pn), np.asarray(x))
    assert bool(pp_ok.all())  # keeping the label is trivially possible
