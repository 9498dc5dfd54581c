"""Jitted classifier / oracle / autoencoder training.

Covers the reference training loops in ``classifiers/mnist.py:27-68``
(cross-entropy digit classifier, Adam 1e-4, inputs scaled to [-1, 1]),
``train_morphomnist_oracles.py`` (per-digit BCE oracles) and
``train_morphomnist_ae.py`` (MSE autoencoders).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, data_mesh

from ._guards import require_full_batch, resolve_batch


@flax.struct.dataclass
class SupervisedState:
    params: Any
    opt: Any
    step: jnp.ndarray
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class SupervisedTrainConfig:
    learning_rate: float = 1e-4
    batch_size: int = 128
    loss: str = "ce"  # "ce" | "bce" | "mse"


class SupervisedTrainer:
    """Generic (model, loss) supervised trainer with a scanned epoch."""

    def __init__(self, module, tcfg: SupervisedTrainConfig, mesh=None):
        self.module = module
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else data_mesh()
        self.tx = optax.adam(tcfg.learning_rate)
        self._epoch_fn = None
        self._eval_fn = None

    def init_state(self, rng: jax.Array, example_x) -> SupervisedState:
        def _init(rng):
            k, rng = jax.random.split(rng)
            variables = self.module.init({"params": k}, example_x)
            params = variables["params"]
            return SupervisedState(
                params=params, opt=self.tx.init(params),
                step=jnp.zeros((), jnp.int32), rng=rng,
            )

        return jax.jit(_init)(rng)

    def _loss(self, logits, y):
        if self.tcfg.loss == "ce":
            return optax.softmax_cross_entropy(logits, y).mean()
        if self.tcfg.loss == "bce":
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()
        if self.tcfg.loss == "mse":
            return jnp.mean((logits - y) ** 2)
        raise ValueError(self.tcfg.loss)

    def train_step(self, state: SupervisedState, batch):
        x, y = batch["x"], batch["y"]
        rng, key = jax.random.split(state.rng)

        def loss_fn(params):
            logits = self.module.apply({"params": params}, x, train=True,
                                       rngs={"dropout": key})
            return self._loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt = self.tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            SupervisedState(params=params, opt=opt, step=state.step + 1, rng=rng),
            {"loss": loss},
        )

    def _build_epoch_fn(self):
        batch_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        repl = NamedSharding(self.mesh, P())

        def epoch(state, batches):
            state, metrics = jax.lax.scan(self.train_step, state, batches)
            return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

        return jax.jit(
            epoch, in_shardings=(repl, batch_sh), out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def run_epoch(self, state, batches):
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
        return self._epoch_fn(state, batches)

    # -------------------------------------------------- device-resident fit

    def upload_dataset(self, x, y):
        """Place (x, y) on the mesh once, sharded over the data axis —
        preferred over per-epoch host batches (no repeated host->device
        traffic; shuffling happens on device)."""
        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        return {
            "x": jax.device_put(np.asarray(x), sh),
            "y": jax.device_put(np.asarray(y), sh),
        }

    def _build_fit_epoch_fn(self, batch_size):
        data_sh = NamedSharding(self.mesh, P(DATA_AXIS))
        repl = NamedSharding(self.mesh, P())

        def epoch(state, data, key):
            n = data["x"].shape[0]
            nb = n // batch_size
            perm = jax.random.permutation(key, n)[: nb * batch_size]
            batches = jax.tree_util.tree_map(
                lambda v: v[perm].reshape((nb, batch_size) + v.shape[1:]), data
            )
            state, metrics = jax.lax.scan(self.train_step, state, batches)
            return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

        return jax.jit(
            epoch, in_shardings=(repl, data_sh, repl), out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def fit_epoch(self, state, data, key):
        """One epoch over a device-resident dataset from :meth:`upload_dataset`."""
        n = data["x"].shape[0]
        if not hasattr(self, "_fit_epoch_fn"):
            self._fit_batch = resolve_batch(n, self.tcfg.batch_size, self.mesh.size)
            self._fit_epoch_fn = self._build_fit_epoch_fn(self._fit_batch)
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        require_full_batch(n, self._fit_batch)
        return self._fit_epoch_fn(state, data, key)

    def predict(self, state: SupervisedState, x):
        if self._eval_fn is None:
            self._eval_fn = jax.jit(
                lambda params, x: self.module.apply({"params": params}, x)
            )
        return self._eval_fn(state.params, x)

    def accuracy(self, state: SupervisedState, x, labels, batch_size: int = 1024) -> float:
        correct = 0
        n = len(x)
        for i in range(0, n, batch_size):
            logits = self.predict(state, jnp.asarray(x[i : i + batch_size]))
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            correct += (pred == np.asarray(labels[i : i + batch_size])).sum()
        return float(correct) / n


def make_supervised_batches(rng: np.random.Generator, x, y, batch_size: int):
    n = len(x) // batch_size * batch_size
    perm = rng.permutation(len(x))[:n]
    nb = n // batch_size

    def rs(v):
        v = np.asarray(v)[perm]
        return v.reshape((nb, batch_size) + v.shape[1:])

    return {"x": rs(x), "y": rs(y)}
