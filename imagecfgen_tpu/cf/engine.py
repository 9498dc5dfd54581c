"""The counterfactual engine: abduct-act-predict as ONE jitted XLA program.

Reference flow (``mnist_gan_counterfactuals.py:62-93``):

1. counterfactual attributes via the causal graph
   (``graph.sample_cf`` — abduct flows/Gumbels, intervene, regenerate),
2. min/max-rescale both factual and counterfactual attributes,
3. abduct image noise z = E(x, a),
4. predict x_cf = G(z, a_cf).

The reference runs this as four host-sequenced model calls; here the whole
chain traces into a single compiled function (graph topology is static at
trace time), so batched CF generation runs at full device throughput —
the BASELINE.json north-star.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from ..core.attributes import AttributeScaler
from ..models.bigan import BiGAN


@dataclasses.dataclass
class CounterfactualEngine:
    """Binds a trained BiGAN (params) + attribute SCM + scaler."""

    bigan: BiGAN
    params_E: Mapping
    params_G: Mapping
    scm: "MNISTAttributeSCM"  # any object with .graph/.params/.state
    scaler: AttributeScaler

    def __post_init__(self):
        self._fn = jax.jit(self._cf, static_argnames=("intervened",))

    # -------------------------------------------------- attr dict plumbing

    def _to_graph_obs(self, attrs: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Model attr dict (one-hot categoricals) -> graph obs (int codes,
        (B,1) continuous)."""
        obs = {}
        for a in self.scaler.spec:
            v = attrs[a.name]
            if a.is_categorical:
                obs[a.name] = jnp.argmax(v, axis=-1)
            else:
                obs[a.name] = v.reshape((-1, 1))
        return obs

    def _to_model_attrs(self, obs: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        attrs = {}
        for a in self.scaler.spec:
            v = obs[a.name]
            if a.is_categorical:
                attrs[a.name] = jax.nn.one_hot(
                    v.reshape((-1,)).astype(jnp.int32), a.n_categories
                )
            else:
                attrs[a.name] = v.reshape((-1,))
        return attrs

    # -------------------------------------------------- the jitted chain

    def _cf(self, rng, x, attrs, intervention_values, intervened):
        obs = self._to_graph_obs(attrs)
        interventions = dict(zip(intervened, intervention_values))
        cf_obs = self.scm.graph.sample_cf(
            self.scm.params, self.scm.state, rng, obs, interventions
        )
        cf_attrs = self._to_model_attrs(cf_obs)

        a_scaled = self.scaler.scale(attrs)
        a_cf_scaled = self.scaler.scale(cf_attrs)

        z = self.bigan.encoder.apply({"params": self.params_E}, x, a_scaled)
        x_cf = self.bigan.generator.apply({"params": self.params_G}, z, a_cf_scaled)
        return x_cf, cf_attrs

    def counterfactual(
        self,
        rng,
        x: jnp.ndarray,
        attrs: Mapping[str, jnp.ndarray],
        interventions: Mapping[str, jnp.ndarray],
    ):
        """``x``: (B,H,W,C) in [-1,1]; ``attrs``: raw (unscaled) model attr
        dict; ``interventions``: graph-convention values (int codes for
        categoricals, (B,1) floats for continuous). Returns (x_cf, cf attr
        dict in model convention, raw units)."""
        names = tuple(sorted(interventions))
        values = tuple(interventions[k] for k in names)
        return self._fn(rng, x, dict(attrs), values, names)

    def reconstruct(self, x, attrs):
        """G(E(x, a), a) — the identity check used throughout the reference
        eval scripts (``mnist_reconstructions.py:54-84``)."""
        a_scaled = self.scaler.scale(dict(attrs))
        z = self.bigan.encoder.apply({"params": self.params_E}, x, a_scaled)
        return self.bigan.generator.apply({"params": self.params_G}, z, a_scaled)
