"""Base distributions + flow-transformed distribution.

The functional replacement for the reference's pyro usage: ``FlowDist``
plays the role of ``TransformedDistribution`` /
``ConditionalTransformedDistribution`` (``attribute_scms/causal_module.py``)
with explicit params/state pytrees.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .bijectors import Bijector, Chain

LOG_2PI = float(jnp.log(2.0 * jnp.pi))


@dataclasses.dataclass(frozen=True)
class Normal:
    loc: float = 0.0
    scale: float = 1.0
    event_shape: Tuple[int, ...] = (1,)

    def sample(self, rng, n: int) -> jnp.ndarray:
        return self.loc + self.scale * jax.random.normal(rng, (n, *self.event_shape))

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        z = (x - self.loc) / self.scale
        lp = -0.5 * (z**2 + LOG_2PI) - jnp.log(self.scale)
        return lp.reshape((x.shape[0], -1)).sum(axis=1)


@dataclasses.dataclass(frozen=True)
class Uniform:
    low: float = 0.0
    high: float = 1.0
    event_shape: Tuple[int, ...] = (1,)

    def sample(self, rng, n: int) -> jnp.ndarray:
        return jax.random.uniform(
            rng, (n, *self.event_shape), minval=self.low, maxval=self.high
        )

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        inside = (x >= self.low) & (x <= self.high)
        lp = jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)
        return lp.reshape((x.shape[0], -1)).sum(axis=1)


@dataclasses.dataclass(frozen=True)
class Gumbel:
    """Standard Gumbel(0, 1) — the exogenous noise of categorical causal
    mechanisms (reference ``attribute_scms/causal_module.py:121-129`` builds
    it from Uniform + two -log transforms)."""

    def sample(self, rng, shape) -> jnp.ndarray:
        return jax.random.gumbel(rng, shape)

    def log_prob(self, g: jnp.ndarray) -> jnp.ndarray:
        return -(g + jnp.exp(-g))


@dataclasses.dataclass(frozen=True)
class Categorical:
    """Categorical over ``n`` classes given a logits array."""

    n: int

    def sample(self, rng, logits: jnp.ndarray, n_samples: Optional[int] = None):
        if logits.ndim == 1 and n_samples is not None:
            logits = jnp.broadcast_to(logits, (n_samples, self.n))
        return jax.random.categorical(rng, logits, axis=-1)

    def log_prob(self, logits: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
        logp = jax.nn.log_softmax(logits, axis=-1)
        value = value.reshape((-1,)).astype(jnp.int32)
        if logp.ndim == 1:
            return logp[value]
        return jnp.take_along_axis(logp, value[:, None], axis=-1)[:, 0]


@dataclasses.dataclass(frozen=True)
class FlowDist:
    """A base distribution pushed through a chain of bijectors.

    ``X = chain.forward(U)``, ``U ~ base``. ``log_prob`` runs the inverse
    chain (also the *abduction* direction of causal modules —
    ``attribute_scms/causal_module.py:54-56``).
    """

    base: Any
    chain: Chain

    @staticmethod
    def create(base, bijectors) -> "FlowDist":
        return FlowDist(base, Chain(tuple(bijectors)))

    def init(self, rng):
        return self.chain.init(rng)

    def forward(self, params, u, context=None, state=None, train=False):
        """noise -> data (generation); returns (x, state)."""
        x, _, state = self.chain.forward(params, u, context, state=state, train=train)
        return x, state

    def inverse(self, params, x, context=None, state=None, train=False):
        """data -> noise (abduction); returns (u, state)."""
        u, _, state = self.chain.inverse(params, x, context, state=state, train=train)
        return u, state

    def log_prob(self, params, x, context=None, state=None, train=False):
        u, ld, state = self.chain.inverse(params, x, context, state=state, train=train)
        return self.base.log_prob(u) + ld, state

    def sample(self, params, rng, n, context=None, state=None, train=False):
        u = self.base.sample(rng, n)
        x, _, state = self.chain.forward(params, u, context, state=state, train=train)
        return x, state
