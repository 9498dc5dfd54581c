"""AudioMNIST attribute SCM: country -> {native_speaker, accent},
native_speaker -> accent; digit/age/gender roots.

Reference graph (``attribute_scms/audio_mnist.py:195-222``): roots are
empirical-categorical MLEs; native_speaker|country is a dense-net
conditional categorical; accent|country,native_speaker uses a two-tower
network in the reference — here a concat-context MLP of matching capacity
(the conditioning set and the Gumbel-max counterfactual machinery are
identical). Training fits the two conditional networks by MLE with
Adam(1e-2) (``attribute_scms/audio_mnist.py:225-270``) as jitted scans.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .graph import CausalGraph
from .module import CategoricalCM, ConditionalCategoricalCM

CARDINALITIES = {
    "accent": 15,
    "age": 5,
    "country_of_origin": 13,
    "digit": 10,
    "gender": 2,
    "native_speaker": 2,
}


def build_audio_mnist_graph() -> CausalGraph:
    g = CausalGraph()
    g.add_node("country_of_origin", CategoricalCM(CARDINALITIES["country_of_origin"]))
    g.add_node(
        "native_speaker",
        ConditionalCategoricalCM(
            CARDINALITIES["native_speaker"],
            context_dim=CARDINALITIES["country_of_origin"],
            hidden=(128, 128, 128),
        ),
    )
    g.add_node(
        "accent",
        ConditionalCategoricalCM(
            CARDINALITIES["accent"],
            context_dim=CARDINALITIES["country_of_origin"]
            + CARDINALITIES["native_speaker"],
            hidden=(128, 64),
        ),
    )
    g.add_node("digit", CategoricalCM(CARDINALITIES["digit"]))
    g.add_node("age", CategoricalCM(CARDINALITIES["age"]))
    g.add_node("gender", CategoricalCM(CARDINALITIES["gender"]))
    g.add_edge("country_of_origin", "native_speaker")
    g.add_edge("country_of_origin", "accent")
    g.add_edge("native_speaker", "accent")
    return g


class AudioMNISTAttributeSCM:
    def __init__(self, graph: CausalGraph, params, state):
        self.graph = graph
        self.params = params
        self.state = state

    TRAINABLE = ("native_speaker", "accent")

    @staticmethod
    def fit(
        attrs: Mapping[str, np.ndarray],
        steps: int = 2000,
        batch_size: int = 10_000,
        learning_rate: float = 1e-2,
        rng=None,
        log_every: int = 0,
    ) -> "AudioMNISTAttributeSCM":
        """``attrs``: dict of int codes (or one-hots) per attribute."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        codes = {}
        for k, card in CARDINALITIES.items():
            v = np.asarray(attrs[k])
            codes[k] = (v.argmax(axis=1) if v.ndim > 1 else v).astype(np.int32)

        graph = build_audio_mnist_graph()
        params, state = graph.init(rng)
        for k in ("country_of_origin", "digit", "age", "gender"):
            params[k] = CategoricalCM.fit_params(jnp.asarray(codes[k]), CARDINALITIES[k])

        n = len(codes["country_of_origin"])
        batch_size = min(batch_size, n)
        nb = n // batch_size
        n_use = nb * batch_size
        data = jnp.stack(
            [
                jnp.asarray(codes["country_of_origin"][:n_use]),
                jnp.asarray(codes["native_speaker"][:n_use]),
                jnp.asarray(codes["accent"][:n_use]),
            ],
            axis=1,
        )

        tx = optax.adam(learning_rate)
        trainable = {k: params[k] for k in AudioMNISTAttributeSCM.TRAINABLE}
        opt = tx.init(trainable)

        def batch_loss(tr, batch):
            obs = {
                "country_of_origin": batch[:, 0],
                "native_speaker": batch[:, 1],
                "accent": batch[:, 2],
            }
            p = dict(params)
            p.update(tr)
            lp, _ = graph.log_prob(p, state, obs)
            return -(lp["native_speaker"] + lp["accent"]).mean()

        @jax.jit
        def epoch(tr, opt, key):
            perm = jax.random.permutation(key, n_use)
            batches = data[perm].reshape((nb, batch_size, 3))

            def body(carry, batch):
                tr, opt = carry
                loss, g = jax.value_and_grad(batch_loss)(tr, batch)
                upd, opt = tx.update(g, opt)
                return (optax.apply_updates(tr, upd), opt), loss

            (tr, opt), losses = jax.lax.scan(body, (tr, opt), batches)
            return tr, opt, losses.mean()

        for step in range(steps):
            rng, key = jax.random.split(rng)
            trainable, opt, loss = epoch(trainable, opt, key)
            if log_every and (step + 1) % log_every == 0:
                print(f"[audio-scm] step {step + 1}/{steps} nll={float(loss):.4f}")

        params.update(jax.device_get(trainable))
        return AudioMNISTAttributeSCM(graph, params, jax.device_get(state))

    def sample(self, rng, obs_in=None, n: int = 1):
        return self.graph.sample(self.params, self.state, rng, obs_in, n)

    def log_prob(self, obs):
        lp, _ = self.graph.log_prob(self.params, self.state, obs)
        return lp

    def sample_cf(self, rng, obs, interventions):
        return self.graph.sample_cf(self.params, self.state, rng, obs, interventions)

    def state_dict(self) -> Dict:
        return {"params": jax.device_get(self.params), "state": jax.device_get(self.state)}

    @staticmethod
    def from_state_dict(sd: Mapping) -> "AudioMNISTAttributeSCM":
        graph = build_audio_mnist_graph()
        return AudioMNISTAttributeSCM(graph, sd["params"], sd["state"])
