"""Unconditional GAN / WGAN-GP training (reference ``gans/audio_mnist.py:
227-330``): Adam(0.5, 0.9), G update every ``d_updates_per_g_update``
steps, selectable BCE or Wasserstein-GP loss; one jitted scan per epoch.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.gan import (
    UncondDiscriminator,
    UncondGANConfig,
    UncondGenerator,
    wgan_disc_loss,
)
from ..parallel.mesh import DATA_AXIS, data_mesh
from .gan_trainer import bce_logits

from ._guards import require_full_batch, resolve_batch


@flax.struct.dataclass
class UncondGANState:
    params_G: Any
    params_D: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class UncondGANTrainConfig:
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.5, 0.9)
    batch_size: int = 64
    d_updates_per_g_update: int = 1
    loss_mode: str = "gan"  # "gan" | "wgan"
    penalty_weight: float = 10.0
    discriminator_weight_decay: float = 0.0


class UncondGANTrainer:
    def __init__(self, cfg: UncondGANConfig, tcfg: UncondGANTrainConfig, mesh=None):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else data_mesh()
        self.G = UncondGenerator(cfg)
        self.D = UncondDiscriminator(cfg)
        b1, b2 = tcfg.betas
        self.tx_g = optax.adam(tcfg.learning_rate, b1=b1, b2=b2)
        if tcfg.discriminator_weight_decay:
            self.tx_d = optax.adamw(
                tcfg.learning_rate, b1=b1, b2=b2,
                weight_decay=tcfg.discriminator_weight_decay,
            )
        else:
            self.tx_d = optax.adam(tcfg.learning_rate, b1=b1, b2=b2)
        self._epoch_fn = None

    def init_state(self, rng) -> UncondGANState:
        h, w = self.cfg.image_size

        def _init(rng):
            kg, kd, rng = jax.random.split(rng, 3)
            pG = self.G.init({"params": kg}, jnp.zeros((2, self.cfg.latent_dim)))["params"]
            pD = self.D.init({"params": kd}, jnp.zeros((2, h, w, 1)))["params"]
            return UncondGANState(
                params_G=pG, params_D=pD,
                opt_g=self.tx_g.init(pG), opt_d=self.tx_d.init(pD),
                step=jnp.zeros((), jnp.int32), rng=rng,
            )

        return jax.jit(_init)(rng)

    def generate(self, state, z):
        return self.G.apply({"params": state.params_G}, z)

    def train_step(self, state: UncondGANState, batch):
        x = batch["image"]
        rng, kz1, kz2, kgp = jax.random.split(state.rng, 4)
        b = x.shape[0]
        mode = self.tcfg.loss_mode

        def d_apply(params, img):
            return self.D.apply({"params": params}, img, train=True)

        # ---- G update (every d_updates_per_g_update steps)
        def g_update(operand):
            params_G, opt_g = operand
            z = jax.random.normal(kz1, (b, self.cfg.latent_dim))

            def loss_fn(pg):
                gen = self.G.apply({"params": pg}, z, train=True)
                d = d_apply(state.params_D, gen)
                if mode == "gan":
                    return bce_logits(d, 1)
                return -d.mean()

            loss, grads = jax.value_and_grad(loss_fn)(params_G)
            upd, opt_g = self.tx_g.update(grads, opt_g, params_G)
            return optax.apply_updates(params_G, upd), opt_g, loss

        def g_skip(operand):
            params_G, opt_g = operand
            return params_G, opt_g, jnp.zeros(())

        do_g = (state.step % self.tcfg.d_updates_per_g_update) == 0
        params_G, opt_g, loss_g = jax.lax.cond(
            do_g, g_update, g_skip, (state.params_G, state.opt_g)
        )

        # ---- D update
        z = jax.random.normal(kz2, (b, self.cfg.latent_dim))
        fake = jax.lax.stop_gradient(self.G.apply({"params": params_G}, z, train=True))

        def d_loss(pd):
            if mode == "gan":
                return 0.5 * (bce_logits(d_apply(pd, x), 1) + bce_logits(d_apply(pd, fake), 0))
            return wgan_disc_loss(
                lambda p, img: self.D.apply({"params": p}, img, train=True),
                pd, x, fake, kgp, self.tcfg.penalty_weight,
            )

        loss_d, grads = jax.value_and_grad(d_loss)(state.params_D)
        upd, opt_d = self.tx_d.update(grads, state.opt_d, state.params_D)
        params_D = optax.apply_updates(state.params_D, upd)

        new_state = UncondGANState(
            params_G=params_G, params_D=params_D, opt_g=opt_g, opt_d=opt_d,
            step=state.step + 1, rng=rng,
        )
        return new_state, {"loss_G": loss_g, "loss_D": loss_d}

    def _build_epoch_fn(self, batch_size):
        data_sh = NamedSharding(self.mesh, P(DATA_AXIS))
        repl = NamedSharding(self.mesh, P())

        def epoch(state, data, key):
            n = data["image"].shape[0]
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
        n = data["image"].shape[0]
        if self._epoch_fn is None:
            self._fit_batch = resolve_batch(n, self.tcfg.batch_size, self.mesh.size)
            self._epoch_fn = self._build_epoch_fn(self._fit_batch)
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        require_full_batch(n, self._fit_batch)
        return self._epoch_fn(state, data, key)

    def upload_dataset(self, x: np.ndarray):
        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        return {"image": jax.device_put(np.asarray(x), sh)}
