"""Quantitative CF / generation metrics.

Rebuilds the reference scoring scripts' math as batched device functions:

- CF effectiveness (``mnist_bigan_score.py:64-100``,
  ``audiomnist_bigan_score.py:78-146``): intervene on a categorical
  attribute with a *different* resampled class, regenerate, and measure how
  often an oracle classifier predicts the intervened class.  The
  reference's host-side ``while (cf == orig).sum() > 0`` rejection loop
  (``mnist_bigan_score.py:83-90``) is replaced by the mathematically
  identical one-shot draw from the conditional with the observed class
  masked out (renormalised categorical — no TPU<->host ping-pong).
- Generation quality (``mnist_generator_score.py:63-76``): classifier
  accuracy on G(z, a) with a ~ attribute SCM samples.
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def resample_excluding(graph, params, state, rng, node: str, obs: Mapping) -> jnp.ndarray:
    """Draw a new class for ``node`` conditionally on its parents, with the
    currently observed class excluded (exact law of resample-until-change)."""
    module = graph.modules[node]
    assert module.categorical
    current = obs[node].reshape((-1,)).astype(jnp.int32)
    b = current.shape[0]
    ctx = graph._context(node, obs)
    if hasattr(module, "logits") and ctx is not None:
        logits = module.logits(params[node], ctx)
    else:
        logits = jnp.broadcast_to(params[node]["logits"], (b, module.n_categories))
    onehot = jax.nn.one_hot(current, module.n_categories, dtype=bool)
    masked = jnp.where(onehot, -jnp.inf, logits)
    return jax.random.categorical(rng, masked, axis=-1)


def cf_effectiveness_score(
    engine,
    classify_fn: Callable,
    x: jnp.ndarray,
    attrs: Mapping[str, jnp.ndarray],
    rng,
    target_attr: str = "digit",
    mc_rounds: int = 1,
    held_out_shift: Optional[Mapping[str, float]] = None,
) -> float:
    """Fraction of counterfactuals the classifier assigns to the intervened
    class. ``attrs`` in model convention (one-hot categoricals, raw units).

    ``held_out_shift`` additionally intervenes each named continuous
    attribute at (observed + shift) — a *compound* intervention whose
    magnitudes push past the training range, so the render sits off the
    data manifold and the metric leaves its saturated band (the hard
    battery's de-saturation knob; VERDICT r3 item 9)."""
    total = 0.0
    for r in range(mc_rounds):
        k1, k2, rng = jax.random.split(rng, 3)
        obs = engine._to_graph_obs(attrs)
        new_cls = resample_excluding(
            engine.scm.graph, engine.scm.params, engine.scm.state, k1, target_attr, obs
        )
        iv = {target_attr: new_cls}
        if held_out_shift:
            for k, dv in held_out_shift.items():
                iv[k] = jnp.asarray(obs[k]) + dv
        x_cf, _ = engine.counterfactual(k2, x, attrs, iv)
        pred = jnp.argmax(classify_fn(x_cf), axis=-1)
        total += float((pred == new_cls).mean())
    return total / mc_rounds


def generator_score(
    generate_fn: Callable,
    classify_fn: Callable,
    scm,
    scaler,
    rng,
    n: int = 1024,
    latent_dim: int = 512,
    class_attr: str = "digit",
    attrs: Optional[Mapping[str, jnp.ndarray]] = None,
) -> float:
    """Classifier accuracy on generated samples G(z, a).

    ``attrs=None`` draws a ~ attribute SCM; passing ``attrs`` (model
    convention, raw units) scores on those instead — the reference's own
    semantics, which iterates the *test-set* attributes
    (``mnist_generator_score.py:63-76``)."""
    k1, k2, rng = jax.random.split(rng, 3)
    if attrs is None:
        samp = scm.sample(k1, n=n)
        attrs = {}
        for a in scaler.spec:
            v = samp[a.name]
            if a.is_categorical:
                attrs[a.name] = jax.nn.one_hot(
                    v.reshape((-1,)).astype(jnp.int32), a.n_categories)
            else:
                attrs[a.name] = v.reshape((-1,))
    else:
        attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
        n = attrs[class_attr].shape[0]
    a_scaled = scaler.scale(attrs)
    z = jax.random.normal(k2, (n, 1, 1, latent_dim))
    gx = generate_fn(z, a_scaled)
    pred = jnp.argmax(classify_fn(gx), axis=-1)
    labels = jnp.argmax(attrs[class_attr], axis=-1)
    return float((pred == labels).mean())
