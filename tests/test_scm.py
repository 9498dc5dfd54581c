import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.flows.bijectors import AffineT, ConditionalAffineT
from imagecfgen_tpu.flows.distributions import FlowDist, Normal
from imagecfgen_tpu.scm.graph import CausalGraph
from imagecfgen_tpu.scm.mnist import MNISTAttributeSCM
from imagecfgen_tpu.scm.module import (
    CategoricalCM,
    ConditionalCategoricalCM,
    FlowCM,
)

KEY = jax.random.PRNGKey(0)


def test_top_sort_respects_edges():
    g = CausalGraph()
    for name in "abcd":
        g.add_node(name, CategoricalCM(2))
    g.add_edge("a", "b")
    g.add_edge("b", "c")
    g.add_edge("a", "c")
    g.add_edge("d", "a")
    order = g.top_sort()
    assert order.index("d") < order.index("a") < order.index("b") < order.index("c")


def _linear_gaussian_graph(a_mu=1.0, a_sigma=2.0, c=3.0, d=-1.0, s=0.5):
    """A = mu + sigma*uA;  B = c*A + d + s*uB — closed-form counterfactuals."""
    g = CausalGraph()
    g.add_node("A", FlowCM(FlowDist.create(Normal(), [AffineT(a_mu, a_sigma)])))
    bij = ConditionalAffineT(context_dim=1, hidden=())
    g.add_node("B", FlowCM(FlowDist.create(Normal(), [bij]), conditional=True))
    g.add_edge("A", "B")
    params, state = g.init(KEY)
    # hand-set the single linear layer: loc = c*ctx + d, log_scale = log(s)
    # Chain params: a tuple with one entry per bijector
    params["B"] = (
        {"mlp": [{"w": jnp.array([[c, 0.0]]), "b": jnp.array([d, float(np.log(s))])}]},
    )
    return g, params, state


def test_linear_gaussian_counterfactual_closed_form():
    c, d, s = 3.0, -1.0, 0.5
    g, params, state = _linear_gaussian_graph(c=c, d=d, s=s)

    a_obs = jnp.array([[2.0], [0.5], [-1.0]])
    b_obs = jnp.array([[4.0], [1.0], [0.0]])
    a_new = jnp.array([[1.0], [1.0], [1.0]])

    cf = g.sample_cf(params, state, KEY, {"A": a_obs, "B": b_obs}, {"A": a_new})
    # closed form: uB = (B - c*A - d)/s is preserved; B_cf = c*A' + d + s*uB
    expected = c * a_new + d + (b_obs - c * a_obs - d)
    assert np.allclose(np.asarray(cf["B"]), np.asarray(expected), atol=1e-5)
    assert np.allclose(np.asarray(cf["A"]), np.asarray(a_new))

    # null intervention reproduces the observation exactly
    cf0 = g.sample_cf(params, state, KEY, {"A": a_obs, "B": b_obs}, {})
    assert np.allclose(np.asarray(cf0["B"]), np.asarray(b_obs), atol=1e-5)
    assert np.allclose(np.asarray(cf0["A"]), np.asarray(a_obs), atol=1e-5)


def test_gumbel_posterior_abduction_consistency():
    """generate(recover_noise(y, ctx), ctx) == y — the Gumbel-max
    counterfactual-stability property the reference relies on
    (attribute_scms/causal_module.py:142-163)."""
    cm = ConditionalCategoricalCM(n=5, context_dim=3)
    params, state = cm.init(KEY)
    k1, k2, k3 = jax.random.split(KEY, 3)
    ctx = jax.random.normal(k1, (256, 3))
    y = cm.sample(params, state, k2, ctx, 256)
    noise = cm.recover_noise(params, state, k3, y, ctx)
    y2 = cm.generate(params, state, noise, ctx)
    assert np.array_equal(np.asarray(y), np.asarray(y2))

    # posterior noise marginals: each coordinate should look Gumbel-ish
    # (finite, and the observed class must hold the max of logits+noise)
    logits = cm.logits(params, ctx)
    assert np.isfinite(np.asarray(noise)).all()
    argmax = np.asarray(jnp.argmax(logits + noise, axis=1))
    assert np.array_equal(argmax, np.asarray(y))


def test_categorical_root_mle():
    values = jnp.asarray(np.random.default_rng(0).choice(4, 1000, p=[0.1, 0.2, 0.3, 0.4]))
    params = CategoricalCM.fit_params(values, 4)
    probs = np.exp(np.asarray(params["logits"]))
    counts = np.bincount(np.asarray(values), minlength=4) / 1000
    assert np.allclose(probs, counts, atol=1e-6)


def _ground_truth_attrs(n, seed=0):
    """The reference's ground-truth Morpho-MNIST SCM
    (create_train_dataset.py:20-52)."""
    rng = np.random.default_rng(seed)
    t = rng.gamma(10.0, 1.0 / 5.0, (n, 1)).astype(np.float32) + 0.5
    e = rng.normal(0, 1, (n, 1)).astype(np.float32)
    i = 191.0 / (1 + np.exp(-(0.5 * e + 2 * t - 5))) + 64.0
    s = np.pi * rng.normal(0, 0.1, (n, 1)).astype(np.float32)
    digit = rng.integers(0, 10, n)
    return {"thickness": t, "intensity": i.astype(np.float32), "slant": s, "digit": digit}


@pytest.mark.slow
def test_mnist_attribute_scm_fit_and_cf():
    attrs = _ground_truth_attrs(20_000)
    scm = MNISTAttributeSCM.fit(attrs, steps=80, batch_size=10_000)

    # model samples should roughly match the data distribution
    samp = scm.sample(jax.random.PRNGKey(1), n=4000)
    t_s = np.asarray(samp["thickness"])
    assert abs(t_s.mean() - attrs["thickness"].mean()) < 0.25
    i_s = np.asarray(samp["intensity"])
    assert abs(i_s.mean() - attrs["intensity"].mean()) < 12.0

    # abduct-act-predict: do(thickness + 2) must raise intensity
    obs = {
        "thickness": jnp.asarray(attrs["thickness"][:512]),
        "intensity": jnp.asarray(attrs["intensity"][:512]),
        "slant": jnp.asarray(attrs["slant"][:512]),
        "digit": jnp.asarray(attrs["digit"][:512]),
    }
    cf = scm.sample_cf(
        jax.random.PRNGKey(2), obs, {"thickness": obs["thickness"] + 2.0}
    )
    assert float(np.mean(np.asarray(cf["intensity"]) - np.asarray(obs["intensity"]))) > 10.0
    # slant has no thickness parent: counterfactual must preserve it exactly
    assert np.allclose(np.asarray(cf["slant"]), np.asarray(obs["slant"]), atol=1e-3)
    # digit noise is the observation itself
    assert np.array_equal(np.asarray(cf["digit"]), np.asarray(obs["digit"]))

    # null intervention: regeneration reproduces continuous observations
    cf0 = scm.sample_cf(jax.random.PRNGKey(3), obs, {})
    assert np.allclose(
        np.asarray(cf0["thickness"]), np.asarray(obs["thickness"]), rtol=1e-3, atol=1e-3
    )
    assert np.allclose(
        np.asarray(cf0["intensity"]), np.asarray(obs["intensity"]), rtol=1e-2, atol=0.5
    )

    # round-trip through state_dict
    scm2 = MNISTAttributeSCM.from_state_dict(scm.state_dict())
    cfb = scm2.sample_cf(jax.random.PRNGKey(2), obs, {"thickness": obs["thickness"] + 2.0})
    assert np.allclose(np.asarray(cfb["intensity"]), np.asarray(cf["intensity"]), atol=1e-4)


def test_mnist_attribute_scm_fit_small_dataset():
    """n < batch_size must clamp the batch, not gather out of bounds.

    Regression: ``nb = max(n // batch_size, 1)`` with the default
    batch_size=10_000 on a small dataset made ``permutation(n_use)``
    index past the data (clamped gather -> batches dominated by the
    last row)."""
    attrs = _ground_truth_attrs(256, seed=3)
    scm = MNISTAttributeSCM.fit(attrs, steps=3)
    lp = scm.log_prob({
        "thickness": attrs["thickness"][:32],
        "intensity": attrs["intensity"][:32],
        "slant": attrs["slant"][:32],
        "digit": attrs["digit"][:32],
    })
    assert np.isfinite(float(np.asarray(lp["thickness"]).mean()))
