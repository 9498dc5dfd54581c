"""Model-agnostic counterfactual explainers.

Rebuilds ``explain/cf_example.py``:

- :class:`DeepCounterfactualExplainer` (``:17-69``): gradient-free — encode
  once, sweep ``sample_points`` convex mixtures between the original and
  target one-hot through the decoder, keep samples the classifier flips,
  rank by mixture / MSE / SSIM distance. On TPU the whole sweep is one
  batched jitted call (the decoder's soft-embedding matmul makes convex
  class mixtures first-class — ``models/layers.py:AttributeVectors``).
- :class:`HingeLossCFExplainer` (``:80-170``): gradient-based — optimize
  attribute logits (softmax for categoricals, tanh for continuous) and
  optionally a latent z, loss = c * hinge(classifier margin) + L1
  proximity, Adam for ``steps`` iterations — expressed as a jitted
  ``lax.fori_loop`` rather than a host loop.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.ssim import ssim


@dataclasses.dataclass
class DeepCounterfactualExplainer:
    encode_fn: callable  # (x, attrs) -> z
    decode_fn: callable  # (z, attrs) -> x
    classify_fn: callable  # (x) -> logits
    target_feature: str

    def __post_init__(self):
        self._sweep = jax.jit(self._sweep_impl, static_argnames=("sample_points", "metric"))

    def _sweep_impl(self, x, attrs, original_class, target_class, sample_points, metric):
        z = self.encode_fn(x, attrs)
        zr = jnp.repeat(z, sample_points, axis=0)
        cf_attrs = {
            k: jnp.repeat(v, sample_points, axis=0)
            for k, v in attrs.items()
            if k != self.target_feature
        }
        n_cls = attrs[self.target_feature].shape[1]
        eye = jnp.eye(n_cls)
        probs = jnp.linspace(0.0, 1.0, sample_points)[:, None]
        cf_attrs[self.target_feature] = (1 - probs) * eye[original_class][None] + probs * eye[
            target_class
        ][None]

        samples = self.decode_fn(zr, cf_attrs)
        preds = jnp.argmax(self.classify_fn(samples), axis=1)
        flipped = preds == target_class

        if metric == "mixture":
            mval = probs[:, 0]
        elif metric == "mse":
            d = samples - x
            mval = (d**2).reshape((sample_points, -1)).mean(axis=1)
        elif metric == "ssim":
            xv = jnp.repeat(x, sample_points, axis=0)
            mval = 1.0 - ssim((xv + 1) / 2, (samples + 1) / 2, data_range=1.0, size_average=False)
        else:
            raise ValueError(metric)
        return samples, mval, flipped

    def explain(
        self,
        x: jnp.ndarray,
        attrs: Mapping[str, jnp.ndarray],
        target_class: int,
        sample_points: int = 100,
        metric: str = "mixture",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``x``: (1,H,W,C). Returns (samples, metric) for the flipped
        subset sorted ascending by metric — all candidates if none flip
        (reference semantics, ``explain/cf_example.py:63-69``)."""
        original_class = int(jnp.argmax(self.classify_fn(x), axis=1)[0])
        samples, mval, flipped = self._sweep(
            x, dict(attrs), original_class, int(target_class), sample_points, metric
        )
        import numpy as np

        samples, mval, flipped = map(np.asarray, (samples, mval, flipped))
        if not flipped.any():
            return samples, mval
        samples, mval = samples[flipped], mval[flipped]
        order = np.argsort(mval)
        return samples[order], mval[order]


@dataclasses.dataclass(eq=False)  # identity hash: instance is a static jit arg
class HingeLossCFExplainer:
    encode_fn: callable
    decode_fn: callable
    classify_fn: callable
    target_feature: str
    latent_dim: int
    categorical_features: Tuple[str, ...] = ()
    features_to_ignore: Tuple[str, ...] = ()
    c: float = 10.0

    def _constrain(self, params, attrs, train_z):
        out = {}
        for k in attrs:
            if k in self.features_to_ignore:
                out[k] = attrs[k]
            elif k in self.categorical_features:
                out[k] = jax.nn.softmax(params[k], axis=1)
            else:
                out[k] = jnp.tanh(params[k])
        z = jnp.tanh(params["z"]) if train_z else None
        return out, z

    @partial(jax.jit, static_argnames=("self", "train_z", "steps", "target_class"))
    def _optimize(self, rng, x, attrs, codes, target_class, train_z, steps, lr):
        k1, k2 = jax.random.split(rng)
        params = {
            k: 0.01
            * jax.random.normal(
                jax.random.fold_in(k1, i),
                (1, attrs[k].shape[1] if attrs[k].ndim > 1 else 1),
            )
            for i, k in enumerate(sorted(attrs))
            if k not in self.features_to_ignore
        }
        if train_z:
            params["z"] = jax.random.normal(k2, codes.shape)

        original_pred = jax.nn.softmax(self.classify_fn(x), axis=1)

        def total_loss(params):
            attrs_cf, z = self._constrain(params, attrs, train_z)
            x_cf = self.decode_fn(z if train_z else codes, attrs_cf)
            pred = self.classify_fn(x_cf)
            if target_class is not None:
                mask = jnp.arange(pred.shape[1]) == target_class
                max_other = jnp.max(jnp.where(mask[None], -jnp.inf, pred), axis=1)
                h = (max_other - pred[:, target_class]).mean()
            else:
                h = ((pred - original_pred) ** 2).mean()
            m = jnp.abs(x - x_cf).mean()
            return self.c * h + m

        tx = optax.adam(lr)
        opt = tx.init(params)

        def body(_, carry):
            params, opt = carry
            g = jax.grad(total_loss)(params)
            upd, opt = tx.update(g, opt)
            return optax.apply_updates(params, upd), opt

        params, _ = jax.lax.fori_loop(0, steps, body, (params, opt))
        attrs_cf, z = self._constrain(params, attrs, train_z)
        return self.decode_fn(z if train_z else codes, attrs_cf), attrs_cf

    def explain(
        self,
        x: jnp.ndarray,
        attrs: Mapping[str, jnp.ndarray],
        target_class: Optional[int] = None,
        train_z: bool = True,
        steps: int = 30,
        lr: float = 0.1,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        codes = self.encode_fn(x, dict(attrs))
        x_cf, _ = self._optimize(
            rng, x, dict(attrs), codes, target_class, train_z, steps, lr
        )
        return x_cf
