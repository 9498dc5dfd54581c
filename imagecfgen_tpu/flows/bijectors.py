"""Normalizing-flow bijectors (JAX-native, functional).

Replaces the reference's dependency on pyro transforms
(``attribute_scms/mnist.py:21-39`` uses BatchNorm, Exp, Sigmoid, Affine,
Spline and conditional affine-autoregressive transforms;
``attribute_scms/causal_module.py:121-129`` builds Gumbels from Uniform +
Exp/Affine chains).  Everything here is a pure function of an explicit
``params``/``state`` pytree so flows jit, vmap and shard like any other JAX
code.

API (uniform across bijectors)::

    params, state = bij.init(rng)
    y, logdet, state = bij.forward(params, x, context, state=state, train=...)
    x, logdet, state = bij.inverse(params, y, context, state=state, train=...)

- ``forward`` maps base noise toward data (pyro's ``_call``); ``inverse``
  maps data toward noise (pyro's ``_inv``, the direction used by
  ``log_prob`` and by counterfactual *abduction*).
- ``logdet`` is the per-sample summed log|d out/d in| of the direction being
  applied, shape ``(B,)``.
- ``state`` is only meaningful for :class:`BatchNormFlow` (running stats;
  train/eval asymmetry mirrors pyro's BatchNorm transform, whose eval-mode
  switch the reference flips manually, e.g.
  ``mnist_gan_counterfactuals.py:34``). Other bijectors carry an empty
  state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Any
State = Any


def _sum_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Sum all but the leading (batch) axis."""
    return x.reshape((x.shape[0], -1)).sum(axis=1)


class Bijector:
    def init(self, rng) -> Tuple[Params, State]:
        return {}, {}

    def forward(self, params, x, context=None, state=None, train=False):
        raise NotImplementedError

    def inverse(self, params, y, context=None, state=None, train=False):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class AffineT(Bijector):
    """y = loc + scale * x with static loc/scale."""

    loc: float
    scale: float

    def forward(self, params, x, context=None, state=None, train=False):
        y = self.loc + self.scale * x
        ld = jnp.full((x.shape[0],), jnp.log(jnp.abs(jnp.asarray(self.scale, jnp.float32)))) * (
            x[0].size if x.ndim > 1 else 1
        )
        return y, ld, state

    def inverse(self, params, y, context=None, state=None, train=False):
        x = (y - self.loc) / self.scale
        ld = jnp.full((y.shape[0],), -jnp.log(jnp.abs(jnp.asarray(self.scale, jnp.float32)))) * (
            y[0].size if y.ndim > 1 else 1
        )
        return x, ld, state


@dataclasses.dataclass(frozen=True)
class ExpT(Bijector):
    """y = exp(x)."""

    def forward(self, params, x, context=None, state=None, train=False):
        return jnp.exp(x), _sum_batch(x), state

    def inverse(self, params, y, context=None, state=None, train=False):
        x = jnp.log(y)
        return x, _sum_batch(-x), state


@dataclasses.dataclass(frozen=True)
class SigmoidT(Bijector):
    """y = sigmoid(x)."""

    def forward(self, params, x, context=None, state=None, train=False):
        y = jax.nn.sigmoid(x)
        ld = _sum_batch(-jax.nn.softplus(x) - jax.nn.softplus(-x))
        return y, ld, state

    def inverse(self, params, y, context=None, state=None, train=False):
        y = jnp.clip(y, 1e-7, 1 - 1e-7)
        x = jnp.log(y) - jnp.log1p(-y)
        ld = _sum_batch(-jnp.log(y) - jnp.log1p(-y))
        return x, ld, state


@dataclasses.dataclass(frozen=True)
class BatchNormFlow(Bijector):
    """Batch-norm bijector with pyro's train/eval asymmetry.

    ``inverse`` (data -> noise, the log_prob/abduction direction) normalizes
    with *batch* statistics when ``train=True`` (updating running stats in
    ``state``) and with running statistics when ``train=False``.
    ``forward`` (noise -> data, the generation direction) always
    de-normalizes with running statistics.
    """

    dim: int = 1
    momentum: float = 0.1
    eps: float = 1e-5

    def init(self, rng):
        params = {
            "log_gamma": jnp.zeros((self.dim,), jnp.float32),
            "beta": jnp.zeros((self.dim,), jnp.float32),
        }
        state = {
            "mean": jnp.zeros((self.dim,), jnp.float32),
            "var": jnp.ones((self.dim,), jnp.float32),
        }
        return params, state

    def forward(self, params, x, context=None, state=None, train=False):
        gamma = jnp.exp(params["log_gamma"])
        std = jnp.sqrt(state["var"] + self.eps)
        y = (x - params["beta"]) / gamma * std + state["mean"]
        ld = _sum_batch(jnp.broadcast_to(jnp.log(std) - params["log_gamma"], x.shape))
        return y, ld, state

    def inverse(self, params, y, context=None, state=None, train=False):
        gamma = jnp.exp(params["log_gamma"])
        if train:
            mean = y.mean(axis=0)
            var = y.var(axis=0)
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * var,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        std = jnp.sqrt(var + self.eps)
        x = (y - mean) / std * gamma + params["beta"]
        ld = _sum_batch(jnp.broadcast_to(params["log_gamma"] - jnp.log(std), y.shape))
        return x, ld, new_state


def _mlp_init(rng, sizes):
    params = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for k, (n_in, n_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        w = jax.random.normal(k, (n_in, n_out)) * jnp.sqrt(1.0 / n_in)
        params.append({"w": w, "b": jnp.zeros((n_out,))})
    return params


def _mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


@dataclasses.dataclass(frozen=True)
class ConditionalAffineT(Bijector):
    """Context-conditioned affine: y = loc(ctx) + exp(clip(s(ctx))) * x.

    The reference's ``conditional_affine_autoregressive(1, 1)``
    (``attribute_scms/mnist.py:29``) degenerates for 1-d inputs to exactly
    this: an MLP from the conditioning context to a (loc, log_scale) pair
    (the autoregressive mask leaves the first output independent of the
    input). Log-scale is clipped like pyro's AffineAutoregressive.
    """

    context_dim: int = 1
    event_dim: int = 1
    hidden: Tuple[int, ...] = (32, 32)
    log_scale_clip: Tuple[float, float] = (-5.0, 3.0)

    def init(self, rng):
        sizes = (self.context_dim, *self.hidden, 2 * self.event_dim)
        return {"mlp": _mlp_init(rng, sizes)}, {}

    def _loc_scale(self, params, context):
        out = _mlp_apply(params["mlp"], context)
        loc, log_scale = jnp.split(out, 2, axis=-1)
        log_scale = jnp.clip(log_scale, *self.log_scale_clip)
        return loc, log_scale

    def forward(self, params, x, context=None, state=None, train=False):
        loc, log_scale = self._loc_scale(params, context)
        y = loc + jnp.exp(log_scale) * x
        return y, _sum_batch(jnp.broadcast_to(log_scale, x.shape)), state

    def inverse(self, params, y, context=None, state=None, train=False):
        loc, log_scale = self._loc_scale(params, context)
        x = (y - loc) * jnp.exp(-log_scale)
        return x, _sum_batch(jnp.broadcast_to(-log_scale, y.shape)), state


@dataclasses.dataclass(frozen=True)
class SplineT(Bijector):
    """Element-wise monotone rational-quadratic spline (Durkan et al. 2019),
    linear-identity tails outside [-bound, bound] — the role pyro's
    ``Spline(1)`` plays for the slant node (``attribute_scms/mnist.py:37``).
    """

    dim: int = 1
    count_bins: int = 8
    bound: float = 3.0
    min_bin: float = 1e-3
    min_deriv: float = 1e-3

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        params = {
            "widths": 1e-2 * jax.random.normal(k1, (self.dim, self.count_bins)),
            "heights": 1e-2 * jax.random.normal(k2, (self.dim, self.count_bins)),
            "derivs": 1e-2 * jax.random.normal(k3, (self.dim, self.count_bins - 1)),
        }
        return params, {}

    def _knots(self, params):
        B = self.bound
        w = jax.nn.softmax(params["widths"], axis=-1)
        h = jax.nn.softmax(params["heights"], axis=-1)
        w = self.min_bin + (1 - self.min_bin * self.count_bins) * w
        h = self.min_bin + (1 - self.min_bin * self.count_bins) * h
        cw = jnp.concatenate(
            [jnp.zeros((self.dim, 1)), jnp.cumsum(w, axis=-1)], axis=-1
        ) * 2 * B - B  # knot x-positions in [-B, B]
        ch = jnp.concatenate(
            [jnp.zeros((self.dim, 1)), jnp.cumsum(h, axis=-1)], axis=-1
        ) * 2 * B - B
        d = self.min_deriv + jax.nn.softplus(params["derivs"])
        # boundary derivatives fixed to 1 for a C0 match with identity tails
        ones = jnp.ones((self.dim, 1))
        d = jnp.concatenate([ones, d, ones], axis=-1)  # (dim, K+1)
        return cw, ch, d

    def _rqs(self, params, v, inverse: bool):
        """Apply the spline (or its inverse) elementwise; v shape (B, dim)."""
        cw, ch, d = self._knots(params)
        B = self.bound
        inside = (v > -B) & (v < B)
        v_in = jnp.clip(v, -B + 1e-6, B - 1e-6)

        knots_in = ch if inverse else cw  # bins located by the input side
        # searchsorted per dim: (B, dim) against (dim, K+1)
        idx = jax.vmap(
            lambda kn, col: jnp.searchsorted(kn, col, side="right") - 1,
            in_axes=(0, 1), out_axes=1,
        )(knots_in, v_in)
        idx = jnp.clip(idx, 0, self.count_bins - 1)

        def take(tbl, i):  # tbl (dim, K+1), i (B, dim) -> (B, dim)
            return jax.vmap(lambda t, ii: t[ii], in_axes=(0, 1), out_axes=1)(tbl, i)

        xk, xk1 = take(cw, idx), take(cw, idx + 1)
        yk, yk1 = take(ch, idx), take(ch, idx + 1)
        dk, dk1 = take(d, idx), take(d, idx + 1)
        wbin = xk1 - xk
        hbin = yk1 - yk
        s = hbin / wbin

        if not inverse:
            xi = (v_in - xk) / wbin
            num = hbin * (s * xi**2 + dk * xi * (1 - xi))
            den = s + (dk1 + dk - 2 * s) * xi * (1 - xi)
            out = yk + num / den
            dnum = s**2 * (dk1 * xi**2 + 2 * s * xi * (1 - xi) + dk * (1 - xi) ** 2)
            logdet = jnp.log(dnum) - 2 * jnp.log(den)
        else:
            # solve the quadratic for xi given y
            t = v_in - yk
            a = hbin * (s - dk) + t * (dk1 + dk - 2 * s)
            b = hbin * dk - t * (dk1 + dk - 2 * s)
            c = -s * t
            disc = b**2 - 4 * a * c
            disc = jnp.maximum(disc, 0.0)
            xi = 2 * c / (-b - jnp.sqrt(disc))
            xi = jnp.clip(xi, 0.0, 1.0)
            out = xk + xi * wbin
            den = s + (dk1 + dk - 2 * s) * xi * (1 - xi)
            dnum = s**2 * (dk1 * xi**2 + 2 * s * xi * (1 - xi) + dk * (1 - xi) ** 2)
            logdet = -(jnp.log(dnum) - 2 * jnp.log(den))

        out = jnp.where(inside, out, v)
        logdet = jnp.where(inside, logdet, 0.0)
        return out, logdet

    def forward(self, params, x, context=None, state=None, train=False):
        squeeze = x.ndim == 1
        xv = x[:, None] if squeeze else x
        y, ld = self._rqs(params, xv, inverse=False)
        return (y[:, 0] if squeeze else y), _sum_batch(ld), state

    def inverse(self, params, y, context=None, state=None, train=False):
        squeeze = y.ndim == 1
        yv = y[:, None] if squeeze else y
        x, ld = self._rqs(params, yv, inverse=True)
        return (x[:, 0] if squeeze else x), _sum_batch(ld), state


@dataclasses.dataclass(frozen=True)
class LinearRationalSplineT(Bijector):
    """Element-wise monotone *linear*-rational spline (Dolatabadi et al.
    2020), identity tails outside [-bound, bound].

    This is the ``order="linear"`` variant that pyro's ``Spline`` uses by
    default (``attribute_scms/mnist.py:37`` constructs ``T.Spline(1)`` with
    default order) — each bin splits at a learnable interior point
    lambda into two linear-rational segments. Parameter constraints follow
    the published spec (and pyro's layout, for checkpoint ingestion):
    softmax widths/heights with min-bin 1e-3, softplus derivatives with
    min 1e-3 and boundary derivatives pinned to 1,
    ``lambda = 0.025 + 0.95 * sigmoid(unnormalized_lambda)``.

    The segment weights are fixed by the knot-interpolation conditions
    (value/derivative continuity at the knots; ``w_a = 1``,
    ``w_b = sqrt(d_k / d_{k+1})``), which the property tests verify
    numerically.
    """

    dim: int = 1
    count_bins: int = 8
    bound: float = 3.0
    min_bin: float = 1e-3
    min_deriv: float = 1e-3

    def init(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        params = {
            "widths": 1e-2 * jax.random.normal(k1, (self.dim, self.count_bins)),
            "heights": 1e-2 * jax.random.normal(k2, (self.dim, self.count_bins)),
            "derivs": 1e-2 * jax.random.normal(k3, (self.dim, self.count_bins - 1)),
            "lambdas": 1e-2 * jax.random.normal(k4, (self.dim, self.count_bins)),
        }
        return params, {}

    def _knots(self, params):
        B = self.bound
        w = jax.nn.softmax(params["widths"], axis=-1)
        h = jax.nn.softmax(params["heights"], axis=-1)
        w = self.min_bin + (1 - self.min_bin * self.count_bins) * w
        h = self.min_bin + (1 - self.min_bin * self.count_bins) * h
        cw = jnp.concatenate(
            [jnp.zeros((self.dim, 1)), jnp.cumsum(w, axis=-1)], axis=-1
        ) * 2 * B - B
        ch = jnp.concatenate(
            [jnp.zeros((self.dim, 1)), jnp.cumsum(h, axis=-1)], axis=-1
        ) * 2 * B - B
        d = self.min_deriv + jax.nn.softplus(params["derivs"])
        ones = jnp.ones((self.dim, 1))
        d = jnp.concatenate([ones, d, ones], axis=-1)  # (dim, K+1)
        lam = 0.025 + 0.95 * jax.nn.sigmoid(params["lambdas"])  # (dim, K)
        return cw, ch, d, lam

    def _lrs(self, params, v, inverse: bool):
        cw, ch, d, lam = self._knots(params)
        B = self.bound
        inside = (v > -B) & (v < B)
        v_in = jnp.clip(v, -B + 1e-6, B - 1e-6)

        knots_in = ch if inverse else cw
        idx = jax.vmap(
            lambda kn, col: jnp.searchsorted(kn, col, side="right") - 1,
            in_axes=(0, 1), out_axes=1,
        )(knots_in, v_in)
        idx = jnp.clip(idx, 0, self.count_bins - 1)

        def take(tbl, i):
            return jax.vmap(lambda t, ii: t[ii], in_axes=(0, 1), out_axes=1)(tbl, i)

        xk, xk1 = take(cw, idx), take(cw, idx + 1)
        yk, yk1 = take(ch, idx), take(ch, idx + 1)
        dk, dk1 = take(d, idx), take(d, idx + 1)
        lm = take(lam, idx)
        wbin = xk1 - xk
        hbin = yk1 - yk
        s = hbin / wbin

        # segment weights from the interpolation conditions:
        #   g'(theta=0)/wbin = dk,  g'(theta=1)/wbin = dk1
        wa = 1.0
        wb = jnp.sqrt(dk / dk1) * wa
        wc = (lm * wa * dk + (1 - lm) * wb * dk1) / s
        yc = ((1 - lm) * wa * yk + lm * wb * yk1) / ((1 - lm) * wa + lm * wb)

        if not inverse:
            theta = (v_in - xk) / wbin
            left = theta <= lm
            num = jnp.where(
                left,
                wa * yk * (lm - theta) + wc * yc * theta,
                wc * yc * (1 - theta) + wb * yk1 * (theta - lm),
            )
            den = jnp.where(
                left,
                wa * (lm - theta) + wc * theta,
                wc * (1 - theta) + wb * (theta - lm),
            )
            out = num / den
            dnum = jnp.where(
                left, wa * wc * lm * (yc - yk), wb * wc * (1 - lm) * (yk1 - yc)
            )
            # dy/dx = dnum / den^2 / wbin
            logdet = jnp.log(dnum) - 2 * jnp.log(jnp.abs(den)) - jnp.log(wbin)
        else:
            y = v_in
            left = y <= yc
            theta = jnp.where(
                left,
                wa * lm * (y - yk) / (wc * yc - wa * yk - y * (wc - wa)),
                (wc * yc - lm * wb * yk1 - y * (wc - lm * wb))
                / (wc * yc - wb * yk1 - y * (wc - wb)),
            )
            theta = jnp.clip(theta, 0.0, 1.0)
            out = xk + theta * wbin
            den = jnp.where(
                left,
                wa * (lm - theta) + wc * theta,
                wc * (1 - theta) + wb * (theta - lm),
            )
            dnum = jnp.where(
                left, wa * wc * lm * (yc - yk), wb * wc * (1 - lm) * (yk1 - yc)
            )
            logdet = -(jnp.log(dnum) - 2 * jnp.log(jnp.abs(den)) - jnp.log(wbin))

        out = jnp.where(inside, out, v)
        logdet = jnp.where(inside, logdet, 0.0)
        return out, logdet

    def forward(self, params, x, context=None, state=None, train=False):
        squeeze = x.ndim == 1
        xv = x[:, None] if squeeze else x
        y, ld = self._lrs(params, xv, inverse=False)
        return (y[:, 0] if squeeze else y), _sum_batch(ld), state

    def inverse(self, params, y, context=None, state=None, train=False):
        squeeze = y.ndim == 1
        yv = y[:, None] if squeeze else y
        x, ld = self._lrs(params, yv, inverse=True)
        return (x[:, 0] if squeeze else x), _sum_batch(ld), state


@dataclasses.dataclass(frozen=True)
class Chain(Bijector):
    """Composition: forward applies bijectors in order (base -> data),
    matching the transform-list order of the reference's
    ``TransformedDistribution`` usage (``attribute_scms/mnist.py:22-24``)."""

    bijectors: Tuple[Bijector, ...]

    def init(self, rng):
        keys = jax.random.split(rng, max(len(self.bijectors), 1))
        ps, ss = [], []
        for k, b in zip(keys, self.bijectors):
            p, s = b.init(k)
            ps.append(p)
            ss.append(s)
        return tuple(ps), tuple(ss)

    def forward(self, params, x, context=None, state=None, train=False):
        total = jnp.zeros((x.shape[0],))
        new_state = []
        for b, p, s in zip(self.bijectors, params, state):
            x, ld, s = b.forward(p, x, context, state=s, train=train)
            total = total + ld
            new_state.append(s)
        return x, total, tuple(new_state)

    def inverse(self, params, y, context=None, state=None, train=False):
        total = jnp.zeros((y.shape[0],))
        new_state = [None] * len(self.bijectors)
        for i in reversed(range(len(self.bijectors))):
            b = self.bijectors[i]
            y, ld, s = b.inverse(params[i], y, context, state=state[i], train=train)
            total = total + ld
            new_state[i] = s
        return y, total, tuple(new_state)
