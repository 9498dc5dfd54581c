import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.core.attributes import MNIST_SPEC
from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
from imagecfgen_tpu.train.gan_trainer import (
    GANTrainConfig,
    GANTrainer,
    make_epoch_batches,
)


def tiny_config():
    """Shrunk MNIST config for fast CPU tests (same topology)."""
    cfg = mnist_bigan_config(latent_dim=16)
    lr, lrd = ("lrelu", 0.2), ("lrelu", 0.1)
    return dataclasses.replace(
        cfg,
        latent_dim=16,
        embed_dim=16,
        embed_hw=(4, 4),
        enc_plan=(
            ("conv", 8, 3, 2, 1), lr,
            ("conv", 16, 4, 2, 1), lr,
            ("conv", 16, 4, 2, 1), lr,
            ("conv", 16, 4, 2, 1), lr,
            ("conv", 16, 1, 2, 0),
        ),
        gen_plan=(
            ("convT", 16, 3, 1, 0), lr,
            ("convT", 16, 3, 2, 0), lr,
            ("convT", 8, 3, 2, 1), lr,
            ("convT", 8, 3, 2, 1), lr,
            ("convT", 1, 4, 1, 0),
            ("tanh",),
        ),
        dx_plan=(
            ("drop2d", 0.2),
            ("conv", 8, 5, 1, 0), lrd,
            ("bn",),
            ("conv", 16, 4, 2, 0), lrd,
            ("conv", 16, 4, 2, 0), lrd,
            ("conv", 16, 4, 1, 0), lrd,
        ),
        dz_plan=(("conv", 16, 1, 1, 0), lrd),
        dxz_plan=(("conv", 16, 1, 1, 0), lrd, ("conv", 1, 1, 1, 0)),
        # larger init than the reference's N(0, 0.01) so single-step update
        # magnitudes are visible to allclose checks in these tests
        init_std=0.2,
    )


def make_attrs(b, rng):
    digits = rng.integers(0, 10, b)
    return {
        "digit": np.eye(10, dtype=np.float32)[digits],
        "thickness": rng.uniform(-1, 1, b).astype(np.float32),
        "intensity": rng.uniform(-1, 1, b).astype(np.float32),
        "slant": rng.uniform(-1, 1, b).astype(np.float32),
    }


def test_full_mnist_config_shapes():
    cfg = mnist_bigan_config()
    model = BiGAN(cfg)
    rng = np.random.default_rng(0)
    b = 2
    x = jnp.zeros((b, 28, 28, 1))
    z = jnp.zeros((b, 1, 1, 512))
    attrs = {k: jnp.asarray(v) for k, v in make_attrs(b, rng).items()}
    key = jax.random.PRNGKey(0)
    vE = model.encoder.init({"params": key}, x, attrs)
    ex = model.encoder.apply(vE, x, attrs)
    assert ex.shape == (b, 1, 1, 512)
    vG = model.generator.init({"params": key}, z, attrs)
    gz = model.generator.apply(vG, z, attrs)
    assert gz.shape == (b, 28, 28, 1)
    vD = model.discriminator.init({"params": key}, x, z, attrs, train=False)
    d = model.discriminator.apply(vD, x, z, attrs, train=False)
    assert d.shape == (b, 1)
    # dx tower spatial collapse: 28 -> 24 -> 11 -> 8 -> 3 -> 1
    assert np.isfinite(np.asarray(d)).all()


def test_train_step_and_epoch_runs():
    model = BiGAN(tiny_config())
    trainer = GANTrainer(model, GANTrainConfig(batch_size=8, d_updates_per_g_update=2))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = 32
    x = rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32)
    attrs = make_attrs(n, rng)
    batches = make_epoch_batches(rng, x, attrs, batch_size=8)
    assert batches["image"].shape == (4, 8, 28, 28, 1)

    step0 = int(state.step)
    state, metrics = trainer.run_epoch(state, batches)
    assert int(state.step) == step0 + 4
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # losses should be positive BCE values
    assert float(metrics["loss_D"]) > 0
    # second epoch reuses the compiled program
    batches = make_epoch_batches(rng, x, attrs, batch_size=8)
    state, metrics2 = trainer.run_epoch(state, batches)
    assert int(state.step) == step0 + 8


def test_training_changes_params_and_respects_schedule():
    model = BiGAN(tiny_config())
    trainer = GANTrainer(model, GANTrainConfig(batch_size=8, d_updates_per_g_update=3))
    state = trainer.init_state(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (8, 28, 28, 1)).astype(np.float32)
    attrs = make_attrs(8, rng)
    batch = {
        "image": jnp.asarray(x),
        "attrs": {k: jnp.asarray(v) for k, v in attrs.items()},
    }
    p_e0 = jax.tree_util.tree_leaves(state.params_E)[0].copy()
    p_d0 = jax.tree_util.tree_leaves(state.vars_D["params"])[0].copy()

    # step 0: EG update happens (0 % 3 == 0)
    state, _ = trainer.jit_step(state, batch)
    p_e1 = jax.tree_util.tree_leaves(state.params_E)[0]
    p_d1 = jax.tree_util.tree_leaves(state.vars_D["params"])[0]
    assert not np.allclose(p_e0, p_e1)
    assert not np.allclose(p_d0, p_d1)

    # step 1: EG update skipped (1 % 3 != 0), D still updates
    state, _ = trainer.jit_step(state, batch)
    p_e2 = jax.tree_util.tree_leaves(state.params_E)[0]
    p_d2 = jax.tree_util.tree_leaves(state.vars_D["params"])[0]
    assert np.allclose(p_e1, p_e2)
    assert not np.allclose(p_d1, p_d2)


def test_epoch_batches_sharded_over_mesh():
    # data-parallel smoke: 8 virtual CPU devices, batch divisible by 8
    assert jax.device_count() == 8
    model = BiGAN(tiny_config())
    trainer = GANTrainer(model, GANTrainConfig(batch_size=16))
    state = trainer.init_state(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (32, 28, 28, 1)).astype(np.float32)
    attrs = make_attrs(32, rng)
    batches = make_epoch_batches(rng, x, attrs, batch_size=16)
    state, metrics = trainer.run_epoch(state, batches)
    assert np.isfinite(float(metrics["loss_D"]))


def test_autoencoder_shape_roundtrip():
    from imagecfgen_tpu.models.classifier import AutoEncoderConfig, ConvAutoEncoder

    ae = ConvAutoEncoder(AutoEncoderConfig())
    x = jnp.zeros((2, 28, 28, 1))
    v = ae.init({"params": jax.random.PRNGKey(0)}, x)
    y = ae.apply(v, x)
    assert y.shape == x.shape
