"""Causal DAG engine — topological sort at build time, jitted inference.

Functional counterpart of the reference's ``CausalModuleGraph``
(``attribute_scms/graph.py:8-184``): ``sample`` (ancestral, holding observed
nodes fixed), ``log_prob`` (per-node conditional likelihoods),
``recover_noise`` (abduction) and ``sample_cf`` (the full
abduct-act-predict counterfactual: complete the observation by sampling,
abduct all exogenous noise, regenerate under the intervention —
``attribute_scms/graph.py:144-184``).

TPU-first: the topology (node order, parent lists) is resolved **at build
time** on the host; every inference method is then a pure function of
``(params, state, rng, obs)`` dictionaries with static structure, so the
whole counterfactual pass traces into a single XLA program.

Value conventions follow :mod:`imagecfgen_tpu.scm.module`; categorical
parents are one-hot encoded into the context (reference
``attribute_scms/graph.py:77-80``), contexts concatenate parents in sorted
name order.
"""
from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from .module import CausalModule


class CausalGraph:
    def __init__(self):
        self.modules: Dict[str, CausalModule] = {}
        self._adj: Dict[str, set] = {}
        self._adj_rev: Dict[str, set] = {}

    # ------------------------------------------------------------ topology

    def add_node(self, name: str, module: CausalModule) -> None:
        self.modules[name] = module
        self._adj.setdefault(name, set())
        self._adj_rev.setdefault(name, set())

    def add_edge(self, u: str, v: str) -> None:
        assert u in self.modules and v in self.modules, "add nodes first"
        self._adj[u].add(v)
        self._adj_rev[v].add(u)

    def parents(self, v: str) -> List[str]:
        return sorted(self._adj_rev[v])

    def top_sort(self) -> List[str]:
        """Kahn's algorithm; deterministic (sorted) tie-breaking."""
        indeg = {v: len(self._adj_rev[v]) for v in self.modules}
        ready = sorted([v for v, d in indeg.items() if d == 0])
        out: List[str] = []
        while ready:
            n = ready.pop(0)
            out.append(n)
            for m in sorted(self._adj[n]):
                indeg[m] -= 1
                if indeg[m] == 0:
                    ready.append(m)
        if len(out) != len(self.modules):
            raise ValueError("graph has a cycle")
        return out

    # ------------------------------------------------------------ params

    def init(self, rng) -> Tuple[Dict, Dict]:
        params, state = {}, {}
        names = sorted(self.modules)
        keys = jax.random.split(rng, max(len(names), 1))
        for k, v in zip(keys, names):
            params[v], state[v] = self.modules[v].init(k)
        return params, state

    # ------------------------------------------------------------ contexts

    def _context(self, v: str, obs: Mapping[str, jnp.ndarray]):
        """Concatenate parent values (one-hot for categorical parents)."""
        cols = []
        for u in self.parents(v):
            mu = self.modules[u]
            val = obs[u]
            if mu.categorical:
                cols.append(jax.nn.one_hot(val.reshape((-1,)).astype(jnp.int32), mu.n_categories))
            else:
                cols.append(val.reshape((val.shape[0], -1)).astype(jnp.float32))
        if not cols:
            return None
        return jnp.concatenate(cols, axis=1)

    def context_dim(self, v: str) -> int:
        d = 0
        for u in self.parents(v):
            mu = self.modules[u]
            d += mu.n_categories if mu.categorical else 1
        return d

    # ------------------------------------------------------------ inference

    def log_prob(
        self, params, state, obs: Mapping[str, jnp.ndarray], train: bool = False
    ):
        """Per-node conditional log-likelihoods for the observed nodes whose
        parents are all observed (reference ``graph.py:91-114``)."""
        lp, new_state = {}, dict(state)
        for v in self.modules:
            if v in obs and all(u in obs for u in self.parents(v)):
                ctx = self._context(v, obs)
                lp[v], new_state[v] = self.modules[v].log_prob(
                    params[v], state[v], obs[v], ctx, train=train
                )
        return lp, new_state

    def recover_noise(self, params, state, rng, obs: Mapping[str, jnp.ndarray]):
        """Abduction for every fully-observed node (``graph.py:68-89``)."""
        noise = {}
        names = [
            v
            for v in self.modules
            if v in obs and all(u in obs for u in self.parents(v))
        ]
        keys = jax.random.split(rng, max(len(names), 1))
        for k, v in zip(keys, names):
            ctx = self._context(v, obs)
            noise[v] = self.modules[v].recover_noise(params[v], state[v], k, obs[v], ctx)
        return noise

    def sample(
        self,
        params,
        state,
        rng,
        obs_in: Optional[Mapping[str, jnp.ndarray]] = None,
        n: int = 1,
    ):
        """Ancestral sampling, holding any given nodes fixed
        (``graph.py:116-142``)."""
        obs = dict(obs_in or {})
        if obs:
            n = next(iter(obs.values())).shape[0]
        order = self.top_sort()
        keys = jax.random.split(rng, len(order))
        for k, v in zip(keys, order):
            if v in obs:
                continue
            ctx = self._context(v, obs)
            obs[v] = self.modules[v].sample(params[v], state[v], k, ctx, n)
        return obs

    def sample_cf(
        self,
        params,
        state,
        rng,
        obs: Mapping[str, jnp.ndarray],
        interventions: Mapping[str, jnp.ndarray],
    ):
        """Abduct-act-predict (``graph.py:144-184``):

        1. complete partial observations by ancestral sampling,
        2. abduct exogenous noise for every node,
        3. regenerate through the mutilated graph: intervened nodes take
           their forced values, all others are re-generated from their
           abducted noise under the new parent values.
        """
        k_fill, k_noise = jax.random.split(rng)
        obs = self.sample(params, state, k_fill, obs)
        noise = self.recover_noise(params, state, k_noise, obs)

        out = dict(interventions)
        for v in self.top_sort():
            if v in out:
                continue
            ctx = self._context(v, out)
            out[v] = self.modules[v].generate(params[v], state[v], noise[v], ctx)
        return out
