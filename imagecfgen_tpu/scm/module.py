"""Causal mechanisms (structural-equation modules), functional JAX.

Mirrors the reference's causal-module contract
(``attribute_scms/causal_module.py:13-38``): every mechanism knows its
exogenous noise distribution and supports

- ``recover_noise`` — *abduction*: posterior over noise given observation,
- ``generate``      — deterministic structural map noise -> value,
- ``log_prob`` / ``sample`` — the observational conditional p(value|parents),

all as pure functions of a ``(params, state)`` pytree so a whole
abduct-act-predict pass jits into one XLA program.

Value conventions: continuous node values are ``(B, 1)`` float; categorical
node values are ``(B,)`` int32. Parent values arrive as a single context
array assembled by the graph (one-hot for categorical parents — reference
``attribute_scms/graph.py:77-80``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..flows.bijectors import _mlp_apply, _mlp_init
from ..flows.distributions import Categorical, FlowDist, Gumbel


class CausalModule:
    #: whether values are int-coded categories
    categorical: bool = False
    n_categories: int = 0

    def init(self, rng) -> Tuple[Any, Any]:
        raise NotImplementedError

    def sample_noise(self, params, rng, n) -> jnp.ndarray:
        raise NotImplementedError

    def recover_noise(self, params, state, rng, value, context) -> jnp.ndarray:
        raise NotImplementedError

    def generate(self, params, state, noise, context) -> jnp.ndarray:
        raise NotImplementedError

    def log_prob(self, params, state, value, context, train=False):
        raise NotImplementedError

    def sample(self, params, state, rng, context, n) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class FlowCM(CausalModule):
    """Continuous mechanism: value = flow.forward(noise | context).

    Unifies the reference's ``TransformedCM`` and
    ``ConditionalTransformedCM`` (``attribute_scms/causal_module.py:41-71,
    99-118``): abduction is the inverse flow, generation the forward flow;
    an unconditional node simply ignores the context.
    """

    flow: FlowDist
    conditional: bool = False

    def init(self, rng):
        return self.flow.init(rng)

    def sample_noise(self, params, rng, n):
        return self.flow.base.sample(rng, n)

    def _ctx(self, context):
        return context if self.conditional else None

    def recover_noise(self, params, state, rng, value, context):
        u, _ = self.flow.inverse(params, value, self._ctx(context), state=state)
        return u

    def generate(self, params, state, noise, context):
        x, _ = self.flow.forward(params, noise, self._ctx(context), state=state)
        return x

    def log_prob(self, params, state, value, context, train=False):
        return self.flow.log_prob(
            params, value, self._ctx(context), state=state, train=train
        )

    def sample(self, params, state, rng, context, n):
        x, _ = self.flow.sample(params, rng, n, self._ctx(context), state=state)
        return x


@dataclasses.dataclass(frozen=True)
class CategoricalCM(CausalModule):
    """Root categorical fit by MLE (empirical frequencies) — reference
    ``attribute_scms/causal_module.py:74-96``: noise *is* the observation.
    """

    n: int

    @property
    def categorical(self):
        return True

    @property
    def n_categories(self):
        return self.n

    def init(self, rng):
        return {"logits": jnp.zeros((self.n,))}, {}

    @staticmethod
    def fit_params(values: jnp.ndarray, n: int):
        """Empirical-frequency MLE from int-coded observations."""
        counts = jnp.bincount(jnp.asarray(values, jnp.int32), length=n)
        probs = counts / counts.sum()
        return {"logits": jnp.log(jnp.maximum(probs, 1e-12))}

    def sample_noise(self, params, rng, n):
        return Categorical(self.n).sample(rng, params["logits"], n)

    def recover_noise(self, params, state, rng, value, context):
        return value

    def generate(self, params, state, noise, context):
        return noise

    def log_prob(self, params, state, value, context, train=False):
        return Categorical(self.n).log_prob(params["logits"], value), state

    def sample(self, params, state, rng, context, n):
        return Categorical(self.n).sample(rng, params["logits"], n)


@dataclasses.dataclass(frozen=True)
class ConditionalCategoricalCM(CausalModule):
    """Categorical mechanism with NN logits and Gumbel-max counterfactuals.

    ``generate(noise, ctx) = argmax(logits(ctx) + noise)`` with Gumbel
    noise; ``recover_noise`` draws from the *posterior* over the Gumbels
    given the observed class (top-down Gumbel-max construction), matching
    the reference (``attribute_scms/causal_module.py:142-163``): the
    observed class receives the max Gumbel, all others are truncated below
    it.
    """

    n: int
    context_dim: int
    hidden: Tuple[int, ...] = (64, 64)

    @property
    def categorical(self):
        return True

    @property
    def n_categories(self):
        return self.n

    def init(self, rng):
        sizes = (self.context_dim, *self.hidden, self.n)
        return {"mlp": _mlp_init(rng, sizes)}, {}

    def logits(self, params, context):
        return _mlp_apply(params["mlp"], context)

    def sample_noise(self, params, rng, n):
        return Gumbel().sample(rng, (n, self.n))

    def recover_noise(self, params, state, rng, value, context):
        logits = self.logits(params, context)
        b = logits.shape[0]
        y = value.reshape((-1,)).astype(jnp.int32)
        g = Gumbel().sample(rng, (b, self.n))
        gk = jnp.take_along_axis(g, y[:, None], axis=1)  # (B,1)
        logits_k = jnp.take_along_axis(logits, y[:, None], axis=1)
        # max value of logits+noise (shifted to the observed class)
        noise_k = gk + jax.nn.logsumexp(logits, axis=1, keepdims=True) - logits_k
        # remaining classes: Gumbels truncated below the observed max
        noise_l = (
            -jnp.log(jnp.exp(-g - logits) + jnp.exp(-gk - logits_k)) - logits
        )
        onehot = jax.nn.one_hot(y, self.n)
        return onehot * noise_k + (1.0 - onehot) * noise_l

    def generate(self, params, state, noise, context):
        logits = self.logits(params, context)
        return jnp.argmax(logits + noise, axis=1)

    def log_prob(self, params, state, value, context, train=False):
        logits = self.logits(params, context)
        return Categorical(self.n).log_prob(logits, value), state

    def sample(self, params, state, rng, context, n):
        logits = self.logits(params, context)
        return Categorical(self.n).sample(rng, logits)
