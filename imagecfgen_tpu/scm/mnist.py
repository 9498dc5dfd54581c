"""Morpho-MNIST attribute SCM: thickness -> intensity, slant, digit.

Mechanisms follow the reference graph (``attribute_scms/mnist.py:14-48``):

- thickness:  N(0,1) -> BatchNorm flow -> Exp          (log-normal family)
- intensity | thickness: N(0,1) -> conditional affine -> Sigmoid ->
              Affine(i_min, i_max - i_min)
- slant:      N(0,1) -> rational-quadratic Spline -> Affine(s_min, s_range)
- digit:      empirical Categorical(10)

plus MLE training of the three continuous mechanisms with Adam(1e-2) for
``steps`` epochs over 10k-sample batches (``attribute_scms/mnist.py:51-95``)
— here the whole epoch is one jitted scan.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..flows.bijectors import (
    AffineT,
    BatchNormFlow,
    ConditionalAffineT,
    ExpT,
    LinearRationalSplineT,
    SigmoidT,
    SplineT,
)
from ..flows.distributions import FlowDist, Normal
from .graph import CausalGraph
from .module import CategoricalCM, FlowCM


def build_mnist_graph(
    intensity_min: float,
    intensity_max: float,
    slant_min: float,
    slant_max: float,
    cond_hidden: Tuple[int, ...] = (32, 32),
    spline: str = "rq",
) -> CausalGraph:
    """``cond_hidden``/``spline`` parametrize the mechanism architectures:
    the defaults are this framework's fit configuration; converted legacy
    checkpoints use pyro's (``cond_hidden=(10,)`` — the
    ``conditional_affine_autoregressive(1, 1)`` hypernet width — and
    ``spline="linear"``, pyro Spline's default order)."""
    g = CausalGraph()
    thickness = FlowCM(FlowDist.create(Normal(), [BatchNormFlow(dim=1), ExpT()]))
    intensity = FlowCM(
        FlowDist.create(
            Normal(),
            [
                ConditionalAffineT(context_dim=1, hidden=tuple(cond_hidden)),
                SigmoidT(),
                AffineT(float(intensity_min), float(intensity_max - intensity_min)),
            ],
        ),
        conditional=True,
    )
    spline_bij = (
        LinearRationalSplineT(dim=1) if spline == "linear" else SplineT(dim=1)
    )
    slant = FlowCM(
        FlowDist.create(
            Normal(),
            [spline_bij, AffineT(float(slant_min), float(slant_max - slant_min))],
        )
    )
    g.add_node("thickness", thickness)
    g.add_node("intensity", intensity)
    g.add_node("slant", slant)
    g.add_node("digit", CategoricalCM(10))
    g.add_edge("thickness", "intensity")
    return g


class MNISTAttributeSCM:
    """Graph + params/state bundle with fit/save/load helpers."""

    CONT = ("thickness", "intensity", "slant")

    def __init__(self, graph: CausalGraph, params, state):
        self.graph = graph
        self.params = params
        self.state = state

    # ------------------------------------------------------------ training

    @staticmethod
    def fit(
        attrs: Mapping[str, np.ndarray],
        steps: int = 2000,
        batch_size: int = 10_000,
        learning_rate: float = 1e-2,
        rng: jax.Array | None = None,
        log_every: int = 0,
        cond_hidden: Tuple[int, ...] = (32, 32),
        spline: str = "rq",
    ) -> "MNISTAttributeSCM":
        """``attrs``: dict with thickness/intensity/slant float arrays and
        int (or one-hot) digit labels. ``cond_hidden``/``spline`` select
        the mechanism architectures (see :func:`build_mnist_graph`)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t = np.asarray(attrs["thickness"], np.float32).reshape(-1, 1)
        i = np.asarray(attrs["intensity"], np.float32).reshape(-1, 1)
        s = np.asarray(attrs["slant"], np.float32).reshape(-1, 1)
        digit = np.asarray(attrs["digit"])
        if digit.ndim > 1:
            digit = digit.argmax(axis=1)

        graph = build_mnist_graph(
            i.min(), i.max(), s.min(), s.max(),
            cond_hidden=cond_hidden, spline=spline,
        )
        params, state = graph.init(rng)
        params["digit"] = CategoricalCM.fit_params(jnp.asarray(digit), 10)

        n = len(t)
        batch_size = min(batch_size, n)
        nb = n // batch_size
        n_use = nb * batch_size
        data = jnp.asarray(np.concatenate([t, i, s], axis=1)[:n_use])

        tx = optax.adam(learning_rate)
        trainable = {k: params[k] for k in MNISTAttributeSCM.CONT}
        opt = tx.init(trainable)

        def batch_loss(tr_params, st, batch):
            obs = {
                "thickness": batch[:, 0:1],
                "intensity": batch[:, 1:2],
                "slant": batch[:, 2:3],
            }
            p = dict(params)
            p.update(tr_params)
            lp, new_st = graph.log_prob(p, st, obs, train=True)
            loss = -(lp["thickness"] + lp["intensity"] + lp["slant"]).mean()
            return loss, new_st

        @jax.jit
        def epoch(tr_params, st, opt, key):
            perm = jax.random.permutation(key, n_use)
            batches = data[perm].reshape((nb, batch_size, 3))

            def body(carry, batch):
                tr_params, st, opt = carry
                (loss, new_st), g = jax.value_and_grad(batch_loss, has_aux=True)(
                    tr_params, st, batch
                )
                upd, opt = tx.update(g, opt)
                tr_params = optax.apply_updates(tr_params, upd)
                return (tr_params, new_st, opt), loss

            (tr_params, st, opt), losses = jax.lax.scan(body, (tr_params, st, opt), batches)
            return tr_params, st, opt, losses.mean()

        for step in range(steps):
            rng, key = jax.random.split(rng)
            trainable, state, opt, loss = epoch(trainable, state, opt, key)
            if log_every and (step + 1) % log_every == 0:
                print(f"[attribute-scm] step {step + 1}/{steps} nll={float(loss):.4f}")

        params.update(jax.device_get(trainable))
        return MNISTAttributeSCM(graph, params, jax.device_get(state))

    # ------------------------------------------------------------ inference

    def sample(self, rng, obs_in=None, n: int = 1):
        return self.graph.sample(self.params, self.state, rng, obs_in, n)

    def log_prob(self, obs):
        lp, _ = self.graph.log_prob(self.params, self.state, obs, train=False)
        return lp

    def recover_noise(self, rng, obs):
        return self.graph.recover_noise(self.params, self.state, rng, obs)

    def sample_cf(self, rng, obs, interventions):
        return self.graph.sample_cf(self.params, self.state, rng, obs, interventions)

    # ------------------------------------------------------------ persistence

    def state_dict(self) -> Dict:
        # bounds/arch are baked into the bijector dataclasses; recover them
        mods = self.graph.modules
        aff_i: AffineT = mods["intensity"].flow.chain.bijectors[2]
        aff_s: AffineT = mods["slant"].flow.chain.bijectors[1]
        cond: ConditionalAffineT = mods["intensity"].flow.chain.bijectors[0]
        spline_kind = (
            "linear"
            if isinstance(mods["slant"].flow.chain.bijectors[0], LinearRationalSplineT)
            else "rq"
        )
        return {
            "params": jax.device_get(self.params),
            "state": jax.device_get(self.state),
            "bounds": {
                "intensity": (aff_i.loc, aff_i.scale),
                "slant": (aff_s.loc, aff_s.scale),
            },
            "arch": {"cond_hidden": tuple(cond.hidden), "spline": spline_kind},
        }

    @staticmethod
    def from_state_dict(sd: Mapping) -> "MNISTAttributeSCM":
        (i_lo, i_rng) = sd["bounds"]["intensity"]
        (s_lo, s_rng) = sd["bounds"]["slant"]
        arch = dict(sd.get("arch", {}))  # absent in round-2 checkpoints
        graph = build_mnist_graph(
            i_lo, i_lo + i_rng, s_lo, s_lo + s_rng,
            cond_hidden=tuple(arch.get("cond_hidden", (32, 32))),
            spline=arch.get("spline", "rq"),
        )
        return MNISTAttributeSCM(graph, sd["params"], sd["state"])
