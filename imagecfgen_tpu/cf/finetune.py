"""Encoder-only reconstruction fine-tuning (freeze G, polish E).

Reference: ``finetune_mnist_bigan.py:60-90`` (and the audio/whale variants):
Adam(1e-5) on E only, loss = reconstruction (MSE or 1-SSIM between x and
G(E(x,c),c)) + mean(z^2) latent penalty. Here the epoch is a jitted scan
over a device-resident dataset.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.bigan import BiGAN
from ..ops.ssim import ssim
from ..parallel.mesh import DATA_AXIS, data_mesh
from ..train._guards import require_full_batch, resolve_batch


@flax.struct.dataclass
class FinetuneState:
    params_E: Any
    opt: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    learning_rate: float = 1e-5
    batch_size: int = 128
    metric: str = "mse"  # "mse" | "ssim"
    latent_weight: float = 1.0
    # rematerialize the E/G forwards in the backward pass — the 512^2
    # ESRF family needs this at useful batch sizes (same trade as
    # GANTrainConfig.remat, train/gan_trainer.py:115-120)
    remat: bool = False


class EncoderFinetuner:
    def __init__(self, bigan: BiGAN, params_G, fcfg: FinetuneConfig, mesh=None):
        self.bigan = bigan
        self.params_G = params_G
        self.fcfg = fcfg
        self.mesh = mesh if mesh is not None else data_mesh()
        self.tx = optax.adam(fcfg.learning_rate)
        self._epoch_fn = None

    def init_state(self, params_E, rng) -> FinetuneState:
        return FinetuneState(params_E=params_E, opt=self.tx.init(params_E), rng=rng)

    def _rec_loss(self, x, xr):
        if self.fcfg.metric == "ssim":
            return 1.0 - ssim((x + 1) / 2, (xr + 1) / 2, data_range=1.0)
        return jnp.mean((x - xr) ** 2)

    def train_step(self, state: FinetuneState, batch, params_G=None):
        """One Adam step on E. ``params_G`` defaults to the constructor
        tree for direct callers; the jitted epoch program passes it as a
        traced ARGUMENT so the large frozen generator is never lowered
        into the HLO as embedded constants (the remote_compile
        "Broken pipe" failure mode at ESRF 512^2 scale — see
        tools/esrf_quality.py and the verify skill)."""
        if params_G is None:
            params_G = self.params_G
        x, attrs = batch["image"], batch["attrs"]
        rng, _ = jax.random.split(state.rng)

        def _e_fwd(params, x, attrs):
            return self.bigan.encoder.apply({"params": params}, x, attrs)

        def _g_fwd(params, z, attrs):
            return self.bigan.generator.apply({"params": params}, z, attrs)

        if self.fcfg.remat:
            _e_fwd = jax.checkpoint(_e_fwd)
            _g_fwd = jax.checkpoint(_g_fwd)

        def loss_fn(params_E):
            z = _e_fwd(params_E, x, attrs)
            xr = _g_fwd(params_G, z, attrs)
            rec = self._rec_loss(x, xr)
            latent = jnp.mean(z**2)
            return rec + self.fcfg.latent_weight * latent, (rec, latent)

        (_, (rec, latent)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_E
        )
        updates, opt = self.tx.update(grads, state.opt, state.params_E)
        params_E = optax.apply_updates(state.params_E, updates)
        return (
            FinetuneState(params_E=params_E, opt=opt, rng=rng),
            {"rec": rec, "latent": latent},
        )

    def _build_epoch_fn(self, batch_size):
        data_sh = NamedSharding(self.mesh, P(DATA_AXIS))
        repl = NamedSharding(self.mesh, P())

        def epoch(state, params_G, data, key):
            n = data["image"].shape[0]
            nb = n // batch_size
            perm = jax.random.permutation(key, n)[: nb * batch_size]
            batches = jax.tree_util.tree_map(
                lambda v: v[perm].reshape((nb, batch_size) + v.shape[1:]), data
            )
            state, metrics = jax.lax.scan(
                lambda st, b: self.train_step(st, b, params_G), state, batches
            )
            return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

        return jax.jit(
            epoch,
            in_shardings=(repl, repl, data_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def fit_epoch(self, state, data, key):
        n = data["image"].shape[0]
        if self._epoch_fn is None:
            self._fit_batch = resolve_batch(n, self.fcfg.batch_size, self.mesh.size)
            self._epoch_fn = self._build_epoch_fn(self._fit_batch)
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
            # frozen G rides along as a jit argument — upload it once here
            self.params_G = jax.device_put(
                self.params_G, NamedSharding(self.mesh, P())
            )
        require_full_batch(n, self._fit_batch)
        return self._epoch_fn(state, self.params_G, data, key)

    def upload_dataset(self, x: np.ndarray, attrs: Mapping[str, np.ndarray]):
        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        data = {"image": np.asarray(x), "attrs": {k: np.asarray(v) for k, v in attrs.items()}}
        return jax.tree_util.tree_map(lambda v: jax.device_put(v, sh), data)
