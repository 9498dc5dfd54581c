"""Jitted alternating BiGAN training.

Reproduces the reference's training dynamics (``image_scms/mnist.py:157-299``)
as a single compiled XLA program per *epoch*:

- per step: one (optional, every ``d_updates_per_g_update``-th) E+G update
  with label-swapped BCE loss, then **two** sequential discriminator Adam
  updates (real pair, then fake pair with the freshly updated D) — exactly
  the reference's schedule (``image_scms/mnist.py:224-241``);
- Adam(0.5, 0.999) with E and G parameters in one optimizer
  (``image_scms/mnist.py:176-179``);
- D runs in train mode throughout (dropout active, batch-norm batch stats +
  running-stat updates threaded through every forward).

TPU-first design:

- the whole epoch is one ``lax.scan`` over pre-permuted device-resident
  batches: zero per-step host dispatch, no ``.item()`` syncs (the
  reference syncs twice per batch, ``image_scms/mnist.py:247-248``);
  diagnostics are accumulated on-device and fetched once per epoch;
- data parallelism: batches sharded over the ``("data",)`` mesh axis,
  params replicated; GSPMD inserts the gradient all-reduce over ICI;
- D(G(z)) / D(E(x)) equilibrium diagnostics reuse the logits of the two D
  update steps instead of re-running 2 extra D forwards + 1 E + 1 G like the
  reference does (``image_scms/mnist.py:243-248``); set
  ``exact_reference_diagnostics=True`` to replicate the wasteful variant.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.attributes import AttributeScaler, AttributeSpec
from ..models.bigan import BiGAN, BiGANConfig
from ..parallel.mesh import DATA_AXIS, data_mesh

from ._guards import require_full_batch, resolve_batch


def flat_adam(learning_rate: float, b1: float, b2: float, mu_dtype=None,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with moments stored as ONE raveled vector per pytree.

    Mathematically identical to ``optax.adam`` (same bias correction and
    eps placement); the difference is purely kernel shape: per-step moment
    and update math runs as a handful of large fused elementwise kernels
    over a contiguous (N,) buffer instead of hundreds of per-leaf kernels.
    The 28^2 MNIST BiGAN step is bound on exactly that per-kernel fixed
    cost (docs/PERF.md trace: ~300 small kernels, 92%-busy device), so
    this converts wasted ramp time into HBM-streaming time."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": jnp.zeros_like(flat, dtype=mu_dtype or flat.dtype),
            "nu": jnp.zeros_like(flat),
        }

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        count = state["count"] + 1
        mu = (1 - b1) * g + b1 * state["mu"].astype(g.dtype)
        nu = (1 - b2) * (g * g) + b2 * state["nu"]
        c = count.astype(g.dtype)
        mu_hat = mu / (1 - b1**c)
        nu_hat = nu / (1 - b2**c)
        step = -learning_rate * mu_hat / (jnp.sqrt(nu_hat) + eps)
        new_state = {
            "count": count,
            "mu": mu.astype(mu_dtype or g.dtype),
            "nu": nu,
        }
        return unravel(step), new_state

    return optax.GradientTransformation(init, update)


def bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """BCE-with-logits against a constant 0/1 target, mean-reduced."""
    if target == 1:
        return jax.nn.softplus(-logits).mean()
    if target == 0:
        return jax.nn.softplus(logits).mean()
    raise ValueError(target)


@flax.struct.dataclass
class GANState:
    params_E: Any
    params_G: Any
    vars_D: Any  # {"params": ..., "batch_stats": ...}
    opt_eg: Any
    opt_d: Any
    step: jnp.ndarray
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.5, 0.999)
    batch_size: int = 64
    d_updates_per_g_update: int = 1
    exact_reference_diagnostics: bool = False
    # rematerialize E/G/D forwards in the backward pass: trades ~1/3 more
    # FLOPs for not keeping every conv activation live — the 512^2 ESRF
    # stacks at real batch sizes exceed single-chip HBM otherwise
    # (SURVEY §7 hard part 6; the reference "solves" this with
    # torch.cuda.empty_cache(), esrf_acoustic.py:378)
    remat: bool = False
    # --- throughput options (off by default: exact reference numerics win
    # for GAN equilibrium; see docs/PERF.md "capturing the headroom") ---
    # run Adam's moment/update math on one raveled vector per network
    # instead of per-leaf kernels: same math, ~6 large fused kernels in
    # place of hundreds of tiny ones (the 28^2 step is bound on exactly
    # that per-kernel overhead)
    flat_adam: bool = False
    # keep Adam's first moment in bfloat16 (optax mu_dtype): -2 bytes/param
    # of optimizer traffic
    mu_dtype: Any = None
    # ONE D update on the concatenated (real, fake) pairs per step instead
    # of the reference's two sequential Adam updates
    # (image_scms/mnist.py:232-241) — saves a full D forward+backward+
    # update; a semantic change (one step on the summed loss, batch-norm
    # stats over the combined batch), so opt-in
    fused_d_steps: bool = False
    # batch the EG loss's two D forwards (real pair, fake pair) into one
    # 2B-batch pass — halves the EG phase's D kernel count; same FLOPs,
    # but D's batch-norm sees the combined batch, so opt-in
    fused_eg_d: bool = False


def _concat_pairs(x_a, x_b, z_a, z_b, attrs):
    """Stack two (x, z) D-input pairs into one 2B batch (shared by the
    fused EG-phase and fused D-step paths; attrs are duplicated)."""
    xcat = jnp.concatenate([x_a, x_b], axis=0)
    zcat = jnp.concatenate([z_a, z_b], axis=0)
    acat = jax.tree_util.tree_map(
        lambda v: jnp.concatenate([v, v], axis=0), attrs)
    return xcat, zcat, acat


class GANTrainer:
    """Builds and runs the jitted training program for a :class:`BiGAN`."""

    def __init__(self, model: BiGAN, tcfg: GANTrainConfig, mesh=None):
        self.model = model
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else data_mesh()
        b1, b2 = tcfg.betas
        make = flat_adam if tcfg.flat_adam else (
            lambda lr, b1, b2, mu_dtype: optax.adam(
                lr, b1=b1, b2=b2, mu_dtype=mu_dtype))
        self.tx_eg = make(tcfg.learning_rate, b1, b2, tcfg.mu_dtype)
        self.tx_d = make(tcfg.learning_rate, b1, b2, tcfg.mu_dtype)
        self._epoch_fn = None

    # ---------------------------------------------------------- init

    def init_state(self, rng: jax.Array) -> GANState:
        cfg = self.model.cfg
        h, w = cfg.image_size
        b = 2
        x = jnp.zeros((b, h, w, cfg.image_channels), jnp.float32)
        z = jnp.zeros((b, 1, 1, cfg.latent_dim), jnp.float32)
        attrs = {}
        for a in cfg.attr_spec.categorical:
            attrs[a.name] = jnp.zeros((b, a.n_categories), jnp.float32).at[:, 0].set(1.0)
        for a in cfg.attr_spec.continuous:
            attrs[a.name] = jnp.zeros((b,), jnp.float32)

        def _init(rng):
            ke, kg, kd, rng = jax.random.split(rng, 4)
            vE = self.model.encoder.init({"params": ke, "dropout": ke}, x, attrs)
            vG = self.model.generator.init({"params": kg, "dropout": kg}, z, attrs)
            vD = self.model.discriminator.init(
                {"params": kd, "dropout": kd}, x, z, attrs, train=True
            )
            params_E, params_G = vE["params"], vG["params"]
            vars_D = {"params": vD["params"], "batch_stats": vD.get("batch_stats", {})}
            opt_eg = self.tx_eg.init({"E": params_E, "G": params_G})
            opt_d = self.tx_d.init(vars_D["params"])
            return GANState(
                params_E=params_E,
                params_G=params_G,
                vars_D=vars_D,
                opt_eg=opt_eg,
                opt_d=opt_d,
                step=jnp.zeros((), jnp.int32),
                rng=rng,
            )

        return jax.jit(_init)(rng)

    @property
    def jit_step(self):
        """Cached single-step jitted program (for interactive/debug use; the
        epoch-level ``lax.scan`` program is the production path)."""
        if not hasattr(self, "_jit_step"):
            self._jit_step = jax.jit(self.train_step)
        return self._jit_step

    # ---------------------------------------------------------- apply helpers

    def _apply_D(self, params_d, batch_stats, x, z, attrs, rng, train=True):
        variables = {"params": params_d, "batch_stats": batch_stats}
        if train:
            out, upd = self.model.discriminator.apply(
                variables, x, z, attrs, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return out, upd.get("batch_stats", batch_stats)
        out = self.model.discriminator.apply(variables, x, z, attrs, train=False)
        return out, batch_stats

    def encode(self, state: GANState, x, attrs):
        return self.model.encoder.apply({"params": state.params_E}, x, attrs)

    def generate(self, state: GANState, z, attrs):
        return self.model.generator.apply({"params": state.params_G}, z, attrs)

    # ---------------------------------------------------------- train step

    def train_step(self, state: GANState, batch) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
        """One alternating-GAN step; pure function of (state, batch)."""
        x, attrs = batch["image"], batch["attrs"]
        cfg = self.model.cfg
        E, G = self.model.encoder, self.model.generator
        rng, kz, ke1, kd1, kd2, kd3, kd4, kdg, kde = jax.random.split(state.rng, 9)
        z = jax.random.normal(kz, (x.shape[0], 1, 1, cfg.latent_dim))

        def _e_fwd(params, x, attrs, key):
            return E.apply({"params": params}, x, attrs, train=True,
                           rngs={"dropout": key})

        def _g_fwd(params, z, attrs):
            return G.apply({"params": params}, z, attrs, train=True)

        _d_fwd = self._apply_D
        if self.tcfg.remat:
            _e_fwd = jax.checkpoint(_e_fwd)
            _g_fwd = jax.checkpoint(_g_fwd)
            _d_fwd = jax.checkpoint(
                lambda pd, bs, xx, zz, aa, kk: self._apply_D(pd, bs, xx, zz, aa, kk)
            )

        # ---- E+G update (every d_updates_per_g_update steps)
        def eg_update(operand):
            params_E, params_G, vars_D, opt_eg = operand

            def loss_fn(params_eg):
                ex = _e_fwd(params_eg["E"], x, attrs, ke1)
                gz = _g_fwd(params_eg["G"], z, attrs)
                if self.tcfg.fused_eg_d:
                    b = x.shape[0]
                    xcat, zcat, acat = _concat_pairs(x, gz, ex, z, attrs)
                    d, bs2 = _d_fwd(
                        vars_D["params"], vars_D["batch_stats"], xcat, zcat,
                        acat, kd1)
                    d_valid, d_fake = d[:b], d[b:]
                else:
                    d_valid, bs1 = _d_fwd(
                        vars_D["params"], vars_D["batch_stats"], x, ex, attrs, kd1
                    )
                    d_fake, bs2 = _d_fwd(
                        vars_D["params"], bs1, gz, z, attrs, kd2
                    )
                # label-swapped EG loss (reference image_scms/mnist.py:228)
                loss = 0.5 * (bce_logits(d_valid, 0) + bce_logits(d_fake, 1))
                return loss, bs2

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                {"E": params_E, "G": params_G}
            )
            updates, new_opt = self.tx_eg.update(
                grads, opt_eg, {"E": params_E, "G": params_G}
            )
            new_params = optax.apply_updates({"E": params_E, "G": params_G}, updates)
            new_vars_D = {"params": vars_D["params"], "batch_stats": new_bs}
            return new_params["E"], new_params["G"], new_vars_D, new_opt, loss

        def eg_skip(operand):
            params_E, params_G, vars_D, opt_eg = operand
            return params_E, params_G, vars_D, opt_eg, jnp.zeros(())

        do_eg = (state.step % self.tcfg.d_updates_per_g_update) == 0
        params_E, params_G, vars_D, opt_eg, loss_eg = jax.lax.cond(
            do_eg, eg_update, eg_skip,
            (state.params_E, state.params_G, state.vars_D, state.opt_eg),
        )

        # fixed E/G outputs for the D updates (detached in the reference)
        ex = jax.lax.stop_gradient(_e_fwd(params_E, x, attrs, ke1))
        gz = jax.lax.stop_gradient(_g_fwd(params_G, z, attrs))

        if self.tcfg.fused_d_steps:
            # ---- throughput mode: ONE update on the concatenated pairs
            b = x.shape[0]

            def d_loss_both(params_d, bs):
                xcat, zcat, acat = _concat_pairs(x, gz, ex, z, attrs)
                d, new_bs = _d_fwd(params_d, bs, xcat, zcat, acat, kd3)
                d_valid, d_fake = d[:b], d[b:]
                loss = bce_logits(d_valid, 1) + bce_logits(d_fake, 0)
                return loss, (new_bs, d_valid, d_fake)

            (loss_d1, (bs, d_valid_logits, d_fake_logits)), grads = (
                jax.value_and_grad(d_loss_both, has_aux=True)(
                    vars_D["params"], vars_D["batch_stats"]))
            updates, opt_d = self.tx_d.update(grads, state.opt_d, vars_D["params"])
            params_D = optax.apply_updates(vars_D["params"], updates)
            loss_d2 = jnp.zeros(())
        else:
            # ---- D update 1: real pair (x, E(x)) labelled valid
            def d_loss_real(params_d, bs):
                d_valid, new_bs = _d_fwd(params_d, bs, x, ex, attrs, kd3)
                return bce_logits(d_valid, 1), (new_bs, d_valid)

            (loss_d1, (bs, d_valid_logits)), grads = jax.value_and_grad(
                d_loss_real, has_aux=True
            )(vars_D["params"], vars_D["batch_stats"])
            updates, opt_d = self.tx_d.update(grads, state.opt_d, vars_D["params"])
            params_D = optax.apply_updates(vars_D["params"], updates)

            # ---- D update 2: fake pair (G(z), z) labelled fake, updated D
            def d_loss_fake(params_d, bs):
                d_fake, new_bs = _d_fwd(params_d, bs, gz, z, attrs, kd4)
                return bce_logits(d_fake, 0), (new_bs, d_fake)

            (loss_d2, (bs, d_fake_logits)), grads = jax.value_and_grad(
                d_loss_fake, has_aux=True
            )(params_D, bs)
            updates, opt_d = self.tx_d.update(grads, opt_d, params_D)
            params_D = optax.apply_updates(params_D, updates)

        # ---- equilibrium diagnostics
        if self.tcfg.exact_reference_diagnostics:
            dg, bs = self._apply_D(params_D, bs, gz, z, attrs, kdg)
            de, bs = self._apply_D(params_D, bs, x, ex, attrs, kde)
            dg_score = jax.nn.sigmoid(dg).mean()
            de_score = jax.nn.sigmoid(de).mean()
        else:
            dg_score = jax.nn.sigmoid(d_fake_logits).mean()
            de_score = jax.nn.sigmoid(d_valid_logits).mean()

        new_state = GANState(
            params_E=params_E,
            params_G=params_G,
            vars_D={"params": params_D, "batch_stats": bs},
            opt_eg=opt_eg,
            opt_d=opt_d,
            step=state.step + 1,
            rng=rng,
        )
        metrics = {
            "loss_EG": loss_eg,
            "loss_D": loss_d1 + loss_d2,
            "D_score": dg_score,   # D(G(z)) — reference calls this D_score
            "EG_score": de_score,  # D(x, E(x))
        }
        return new_state, metrics

    # ---------------------------------------------------------- epoch program

    def _build_epoch_fn(self):
        mesh = self.mesh
        batch_sh = NamedSharding(mesh, P(None, DATA_AXIS))  # (n_batches, B, ...)
        repl = NamedSharding(mesh, P())

        def epoch(state: GANState, batches):
            def body(st, batch):
                st, metrics = self.train_step(st, batch)
                return st, metrics

            state, metrics = jax.lax.scan(body, state, batches)
            return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

        return jax.jit(
            epoch,
            in_shardings=(repl, batch_sh),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def run_epoch(self, state: GANState, batches) -> Tuple[GANState, Dict[str, float]]:
        """``batches``: pytree with leaves shaped (n_batches, B, ...)."""
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
            # pin the state to its steady-state sharding so the donated
            # argument has identical layout on every call (a mismatch on the
            # second call would silently recompile the whole epoch program)
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        state, metrics = self._epoch_fn(state, batches)
        return state, metrics

    # ------------------------------------------------------------ full fit

    def _build_fit_epoch_fn(self, batch_size: int):
        """Epoch program with *on-device* shuffling: the dataset stays
        resident on the mesh across the whole run; each epoch is one jitted
        call of permutation -> gather -> scan. No per-epoch host->device
        traffic (the reference re-enters the device every batch —
        ``image_scms/mnist.py:204``)."""
        mesh = self.mesh
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())

        def epoch(state: GANState, data, key):
            n = data["image"].shape[0]
            nb = n // batch_size
            perm = jax.random.permutation(key, n)[: nb * batch_size]

            def gather(v):
                return v[perm].reshape((nb, batch_size) + v.shape[1:])

            batches = jax.tree_util.tree_map(gather, data)

            def body(st, batch):
                return self.train_step(st, batch)

            state, metrics = jax.lax.scan(body, state, batches)
            return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

        return jax.jit(
            epoch,
            in_shardings=(repl, data_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def upload_dataset(self, x: np.ndarray, attrs: Mapping[str, np.ndarray]):
        """Place the full (image, attrs) dataset on the mesh, sharded over
        the data axis. Images are expected already scaled to [-1, 1] NHWC."""
        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        data = {"image": np.asarray(x), "attrs": {k: np.asarray(v) for k, v in attrs.items()}}
        return jax.tree_util.tree_map(lambda v: jax.device_put(v, sh), data)

    def fit_epoch(self, state: GANState, data, key) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
        """One epoch over a device-resident dataset from :meth:`upload_dataset`."""
        n = data["image"].shape[0]
        if not hasattr(self, "_fit_epoch_fn"):
            self._fit_batch = resolve_batch(n, self.tcfg.batch_size, self.mesh.size)
            self._fit_epoch_fn = self._build_fit_epoch_fn(self._fit_batch)
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        require_full_batch(n, self._fit_batch)
        return self._fit_epoch_fn(state, data, key)


def make_epoch_batches(
    rng: np.random.Generator,
    x: np.ndarray,
    attrs: Mapping[str, np.ndarray],
    batch_size: int,
):
    """Host-side shuffle + static-shape batching (drops the ragged tail —
    the reference instead emits one short final batch, which under jit would
    force a recompile per epoch)."""
    n = len(x) // batch_size * batch_size
    perm = rng.permutation(len(x))[:n]
    nb = n // batch_size

    def rs(v):
        v = np.asarray(v)[perm]
        return v.reshape((nb, batch_size) + v.shape[1:])

    return {"image": rs(x), "attrs": {k: rs(v) for k, v in attrs.items()}}
