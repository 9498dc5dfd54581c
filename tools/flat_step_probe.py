"""Probe: differentiate the MNIST BiGAN step w.r.t. ONE raveled buffer.

Round-3's `flat_adam` A/B lost 25% because it raveled the *gradient tree*
after autodiff — an extra full read+write of all grads. This probe tests
the other formulation: keep the E+G and D parameters as single flat (N,)
buffers in the carried state, unravel them *inside* the loss, and take
``jax.grad`` with respect to the flat buffer itself. The forward then
pays ~100 dynamic-slice reads (fusable into consumers), the backward
transposes them into updates of one flat gradient buffer, and Adam runs
as ~6 large streaming kernels per network instead of hundreds of
per-leaf ones — attacking exactly the per-kernel fixed cost docs/PERF.md
identifies as the batch-64 bottleneck.

Semantics mirror the parity config (d_updates_per_g_update=1: one
label-swapped EG update + two sequential D Adam updates per step,
Adam(0.5, 0.999), D train-mode batch stats carried) so steps/sec is
comparable with `tools/throughput_ab.py`'s baseline row. Timing uses the
bench.py protocol: whole scanned epochs, hard device->host sync.

Usage: python tools/flat_step_probe.py [--batch 64] [--epochs 20]
Appends one JSON line per case to --out (default stdout).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _data(n):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32)
    attrs = {
        "digit": np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)],
        "thickness": rng.uniform(-1, 1, n).astype(np.float32),
        "intensity": rng.uniform(-1, 1, n).astype(np.float32),
        "slant": rng.uniform(-1, 1, n).astype(np.float32),
    }
    return x, attrs


def _flat_adam_update(g, mu, nu, count, lr, b1, b2, eps=1e-8):
    """One Adam update on flat (N,) buffers; optax-equivalent math."""
    import jax.numpy as jnp

    count = count + 1
    mu = (1 - b1) * g + b1 * mu
    nu = (1 - b2) * (g * g) + b2 * nu
    c = count.astype(g.dtype)
    step = -lr * (mu / (1 - b1**c)) / (jnp.sqrt(nu / (1 - b2**c)) + eps)
    return step, mu, nu, count


def measure_flat(batch, n_data, epochs, lr=1e-4, betas=(0.5, 0.999)):
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer, bce_logits
    from imagecfgen_tpu.utils.profiling import sync

    b1, b2 = betas
    model = BiGAN(mnist_bigan_config())
    trainer = GANTrainer(model, GANTrainConfig(batch_size=batch))
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    x, attrs = _data(n_data)

    flat_eg, unravel_eg = ravel_pytree({"E": state0.params_E, "G": state0.params_G})
    flat_d, unravel_d = ravel_pytree(state0.vars_D["params"])
    E, G = model.encoder, model.generator
    cfg = model.cfg

    def _d_fwd(params_d, batch_stats, xx, zz, aa, key):
        out, upd = model.discriminator.apply(
            {"params": params_d, "batch_stats": batch_stats}, xx, zz, aa,
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return out, upd.get("batch_stats", batch_stats)

    def step(carry, batch):
        flat_eg, flat_d, bs, mu_eg, nu_eg, mu_d, nu_d, count, rng = carry
        xb, ab = batch["image"], batch["attrs"]
        rng, kz, ke1, kd1, kd2, kd3, kd4 = jax.random.split(rng, 7)
        z = jax.random.normal(kz, (xb.shape[0], 1, 1, cfg.latent_dim))

        # ---- EG update: grad w.r.t. the flat buffer directly
        def eg_loss(feg):
            p = unravel_eg(feg)
            ex = E.apply({"params": p["E"]}, xb, ab, train=True,
                         rngs={"dropout": ke1})
            gz = G.apply({"params": p["G"]}, z, ab, train=True)
            pd = unravel_d(flat_d)
            d_valid, bs1 = _d_fwd(pd, bs, xb, ex, ab, kd1)
            d_fake, bs2 = _d_fwd(pd, bs1, gz, z, ab, kd2)
            loss = 0.5 * (bce_logits(d_valid, 0) + bce_logits(d_fake, 1))
            return loss, bs2

        (loss_eg, bs), g = jax.value_and_grad(eg_loss, has_aux=True)(flat_eg)
        upd, mu_eg, nu_eg, count = _flat_adam_update(g, mu_eg, nu_eg, count, lr, b1, b2)
        flat_eg = flat_eg + upd

        p = unravel_eg(flat_eg)
        ex = jax.lax.stop_gradient(
            E.apply({"params": p["E"]}, xb, ab, train=True, rngs={"dropout": ke1}))
        gz = jax.lax.stop_gradient(G.apply({"params": p["G"]}, z, ab, train=True))

        # ---- D update 1 (real pair)
        def d_loss_real(fd, bs):
            d_valid, new_bs = _d_fwd(unravel_d(fd), bs, xb, ex, ab, kd3)
            return bce_logits(d_valid, 1), (new_bs, d_valid)

        (loss_d1, (bs, d_valid)), g = jax.value_and_grad(d_loss_real, has_aux=True)(flat_d, bs)
        upd, mu_d, nu_d, _ = _flat_adam_update(g, mu_d, nu_d, count, lr, b1, b2)
        flat_d = flat_d + upd

        # ---- D update 2 (fake pair, updated D)
        def d_loss_fake(fd, bs):
            d_fake, new_bs = _d_fwd(unravel_d(fd), bs, gz, z, ab, kd4)
            return bce_logits(d_fake, 0), (new_bs, d_fake)

        (loss_d2, (bs, d_fake)), g = jax.value_and_grad(d_loss_fake, has_aux=True)(flat_d, bs)
        upd, mu_d, nu_d, _ = _flat_adam_update(g, mu_d, nu_d, count, lr, b1, b2)
        flat_d = flat_d + upd

        metrics = {"loss_EG": loss_eg, "loss_D": loss_d1 + loss_d2,
                   "D_score": jax.nn.sigmoid(d_fake).mean(),
                   "EG_score": jax.nn.sigmoid(d_valid).mean()}
        return (flat_eg, flat_d, bs, mu_eg, nu_eg, mu_d, nu_d, count, rng), metrics

    def epoch(carry, data, key):
        n = data["image"].shape[0]
        nb = n // batch
        perm = jax.random.permutation(key, n)[: nb * batch]
        batches = jax.tree_util.tree_map(
            lambda v: v[perm].reshape((nb, batch) + v.shape[1:]), data)
        carry, metrics = jax.lax.scan(step, carry, batches)
        return carry, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

    epoch_fn = jax.jit(epoch, donate_argnums=(0,))
    zeros = jnp.zeros_like
    carry = (flat_eg, flat_d, state0.vars_D["batch_stats"],
             zeros(flat_eg), zeros(flat_eg), zeros(flat_d), zeros(flat_d),
             jnp.zeros((), jnp.int32), jax.random.PRNGKey(7))
    data = {"image": jax.device_put(x),
            "attrs": {k: jax.device_put(v) for k, v in attrs.items()}}
    key = jax.random.PRNGKey(1)
    for w in range(2):
        carry, m = epoch_fn(carry, data, jax.random.fold_in(key, w))
        sync(m)
    t0 = time.perf_counter()
    for e in range(epochs):
        carry, m = epoch_fn(carry, data, jax.random.fold_in(key, 2 + e))
    loss = sync(m)
    dt = time.perf_counter() - t0
    assert np.isfinite(jax.tree_util.tree_leaves(loss)[0])
    return (n_data // batch) * epochs / dt, {k: float(v) for k, v in m.items()}


def measure_baseline(batch, n_data, epochs):
    import jax

    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
    from imagecfgen_tpu.utils.profiling import sync

    trainer = GANTrainer(BiGAN(mnist_bigan_config()), GANTrainConfig(batch_size=batch))
    x, attrs = _data(n_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(1)
    for w in range(2):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, w))
        sync(m)
    t0 = time.perf_counter()
    for e in range(epochs):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 2 + e))
    loss = sync(m)
    dt = time.perf_counter() - t0
    assert np.isfinite(jax.tree_util.tree_leaves(loss)[0])
    return (n_data // batch) * epochs / dt, {k: float(v) for k, v in m.items()}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-data", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    recs = []
    if not args.skip_baseline:
        sps, m = measure_baseline(args.batch, args.n_data, args.epochs)
        recs.append({"case": "baseline", "batch": args.batch,
                     "steps_per_sec": round(sps, 2), "metrics": m})
        print(recs[-1])
    sps, m = measure_flat(args.batch, args.n_data, args.epochs)
    recs.append({"case": "flat_params_grad", "batch": args.batch,
                 "steps_per_sec": round(sps, 2), "metrics": m})
    print(recs[-1])
    if args.out:
        with open(args.out, "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
