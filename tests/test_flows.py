import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.flows.bijectors import (
    AffineT,
    BatchNormFlow,
    Chain,
    ConditionalAffineT,
    ExpT,
    LinearRationalSplineT,
    SigmoidT,
    SplineT,
)
from imagecfgen_tpu.flows.distributions import FlowDist, Normal

KEY = jax.random.PRNGKey(0)


def _roundtrip(bij, params, state, x, context=None, train=False):
    y, ld_f, st = bij.forward(params, x, context, state=state, train=train)
    x2, ld_i, _ = bij.inverse(params, y, context, state=st, train=False)
    return y, x2, ld_f, ld_i


def _check_logdet_vs_autodiff(bij, params, state, x, context=None):
    """Scalar (B,1) inputs: compare logdet with autodiff d forward/dx."""

    def f(xi):
        y, _, _ = bij.forward(params, xi[None, None], context, state=state)
        return y[0, 0]

    _, ld, _ = bij.forward(params, x, context, state=state)
    for i in range(x.shape[0]):
        g = jax.grad(f)(x[i, 0])
        assert np.allclose(float(ld[i]), float(jnp.log(jnp.abs(g))), atol=1e-4), (
            bij,
            i,
        )


@pytest.mark.parametrize(
    "bij",
    [
        AffineT(2.0, 3.5),
        ExpT(),
        SigmoidT(),
        SplineT(dim=1, count_bins=8, bound=3.0),
        LinearRationalSplineT(dim=1, count_bins=8, bound=3.0),
    ],
)
def test_roundtrip_and_logdet(bij):
    params, state = bij.init(KEY)
    x = jnp.linspace(-2.0, 2.0, 9)[:, None]
    y, x2, ld_f, ld_i = _roundtrip(bij, params, state, x)
    assert np.allclose(np.asarray(x), np.asarray(x2), atol=1e-4)
    assert np.allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=1e-4)
    _check_logdet_vs_autodiff(bij, params, state, x)


def test_spline_monotone_and_tails():
    bij = SplineT(dim=1, count_bins=8, bound=3.0)
    params, _ = bij.init(jax.random.PRNGKey(7))
    # perturb params so the spline is non-trivial
    params = jax.tree_util.tree_map(
        lambda p: p + 0.5 * jax.random.normal(jax.random.PRNGKey(8), p.shape), params
    )
    x = jnp.linspace(-5.0, 5.0, 201)[:, None]
    y, _, _ = bij.forward(params, x, state={})
    dy = np.diff(np.asarray(y)[:, 0])
    assert (dy > 0).all(), "spline must be strictly monotone"
    # identity outside the bound
    outside = np.abs(np.asarray(x)[:, 0]) > 3.0
    assert np.allclose(np.asarray(y)[outside, 0], np.asarray(x)[outside, 0])
    # exact inverse roundtrip inside
    x2, _, _ = bij.inverse(params, y, state={})
    assert np.allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_linear_rational_spline_properties():
    """The LRS construction is pinned by its knot conditions: value
    continuity at every knot and at each bin's interior lambda point, and
    derivative d_k at each interior knot (from both adjacent bins). These
    conditions uniquely determine the pyro-convention segment weights, so
    passing them numerically validates checkpoint-ingestion parity."""
    bij = LinearRationalSplineT(dim=1, count_bins=8, bound=3.0)
    params, _ = bij.init(jax.random.PRNGKey(11))
    params = jax.tree_util.tree_map(
        lambda p: p + 0.7 * jax.random.normal(jax.random.PRNGKey(12), p.shape),
        params,
    )
    # monotone + identity tails
    x = jnp.linspace(-5.0, 5.0, 401)[:, None]
    y, _, _ = bij.forward(params, x, state={})
    dy = np.diff(np.asarray(y)[:, 0])
    assert (dy > 0).all()
    outside = np.abs(np.asarray(x)[:, 0]) > 3.0
    assert np.allclose(np.asarray(y)[outside, 0], np.asarray(x)[outside, 0])
    # roundtrip
    x2, _, _ = bij.inverse(params, y, state={})
    assert np.allclose(np.asarray(x2), np.asarray(x), atol=1e-4)

    # derivative at each interior knot equals d_k from BOTH sides
    cw, ch, d, lam = bij._knots(params)
    cw, d = np.asarray(cw)[0], np.asarray(d)[0]

    def deriv_at(x0):
        f = lambda xi: bij.forward(params, xi[None, None], state={})[0][0, 0]
        return float(jax.grad(f)(jnp.asarray(x0)))

    for k in range(1, bij.count_bins):
        for eps in (-1e-5, 1e-5):
            g = deriv_at(cw[k] + eps)
            assert abs(g - d[k]) / d[k] < 1e-2, (k, eps, g, d[k])
    # boundary derivatives pinned to 1 (identity-tail continuity)
    for x0 in (-3.0 + 1e-5, 3.0 - 1e-5):
        assert abs(deriv_at(x0) - 1.0) < 1e-2


def test_conditional_affine_roundtrip():
    bij = ConditionalAffineT(context_dim=1)
    params, state = bij.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 1))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (16, 1))
    y, ld_f, _ = bij.forward(params, x, ctx, state=state)
    x2, ld_i, _ = bij.inverse(params, y, ctx, state=state)
    assert np.allclose(np.asarray(x), np.asarray(x2), atol=1e-5)
    assert np.allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=1e-5)
    # context actually matters
    y_other, _, _ = bij.forward(params, x, ctx + 1.0, state=state)
    assert not np.allclose(np.asarray(y), np.asarray(y_other))


def test_batchnorm_flow_train_eval_asymmetry():
    bij = BatchNormFlow(dim=1)
    params, state = bij.init(KEY)
    data = 5.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(3), (512, 1))

    # train-mode inverse normalizes with batch stats and updates running stats
    u, _, state1 = bij.inverse(params, data, state=state, train=True)
    assert abs(float(u.mean())) < 0.2
    assert float(state1["mean"][0]) != 0.0

    # after many updates running stats converge to data stats
    st = state
    for _ in range(100):
        _, _, st = bij.inverse(params, data, state=st, train=True)
    assert np.allclose(float(st["mean"][0]), float(data.mean()), atol=0.05)
    assert np.allclose(float(st["var"][0]), float(data.var()), atol=0.1)

    # eval-mode roundtrip with converged stats
    u, ldi, _ = bij.inverse(params, data, state=st, train=False)
    x2, ldf, _ = bij.forward(params, u, state=st)
    assert np.allclose(np.asarray(x2), np.asarray(data), atol=1e-4)
    assert np.allclose(np.asarray(ldi), -np.asarray(ldf), atol=1e-5)


def test_flowdist_mle_recovers_lognormal():
    """Fit the reference's thickness flow (BatchNorm + Exp over N(0,1),
    attribute_scms/mnist.py:21-24) to log-normal data by MLE."""
    import optax

    flow = FlowDist.create(Normal(), [BatchNormFlow(dim=1), ExpT()])
    params, state = flow.init(KEY)
    data = jnp.exp(1.5 + 0.5 * jax.random.normal(jax.random.PRNGKey(4), (4096, 1)))

    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, state, opt):
        def loss_fn(p):
            lp, new_state = flow.log_prob(p, data, state=state, train=True)
            return -lp.mean(), new_state

        (loss, new_state), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), new_state, opt, loss

    for _ in range(300):
        params, state, opt, loss = step(params, state, opt)

    # analytic NLL of lognormal(1.5, 0.5): E[-log p] = log(sigma*sqrt(2pi)) + 0.5 + mu
    target = float(jnp.log(0.5 * jnp.sqrt(2 * jnp.pi)) + 0.5 + 1.5)
    assert abs(float(loss) - target) < 0.05

    # abduction/generation roundtrip in eval mode
    u, _ = flow.inverse(params, data[:16], state=state, train=False)
    x2, _ = flow.forward(params, u, state=state, train=False)
    assert np.allclose(np.asarray(x2), np.asarray(data[:16]), rtol=1e-4)
