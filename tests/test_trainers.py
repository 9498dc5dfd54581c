import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.cf.finetune import EncoderFinetuner, FinetuneConfig
from imagecfgen_tpu.models.bigan import BiGAN
from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config
from imagecfgen_tpu.parallel.mesh import data_mesh
from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
from imagecfgen_tpu.train.vae_trainer import VAETrainConfig, VAETrainer

from test_bigan import make_attrs, tiny_config


def tiny_vae_config():
    return dataclasses.replace(tiny_config(), init_std=1e-2)


def _data(n=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32)
    return x, make_attrs(n, rng)


def test_data_parallel_loss_trajectories_match():
    """The same global batch on a 1-device and an 8-device mesh must give
    the same loss trajectory (replicated params, batch sharded, GSPMD
    all-reduce) — the fake-backend distributed test from SURVEY §4."""
    x, attrs = _data(64)
    traj = {}
    for ndev in (1, 8):
        mesh = data_mesh(jax.devices()[:ndev])
        trainer = GANTrainer(
            BiGAN(tiny_config()),
            GANTrainConfig(batch_size=16, d_updates_per_g_update=2),
            mesh=mesh,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        data = trainer.upload_dataset(x, attrs)
        losses = []
        for e in range(3):
            state, m = trainer.fit_epoch(state, data, jax.random.PRNGKey(100 + e))
            losses.append([float(m["loss_D"]), float(m["loss_EG"]),
                           float(m["D_score"]), float(m["EG_score"])])
        traj[ndev] = np.asarray(losses)
    assert np.allclose(traj[1], traj[8], rtol=2e-3, atol=2e-4), traj


def test_vae_trainer_decreases_loss():
    model = ConditionalVAE(tiny_vae_config())
    trainer = VAETrainer(model, VAETrainConfig(batch_size=8, kl_weight=1.0))
    state = trainer.init_state(jax.random.PRNGKey(0))
    x, attrs = _data(32)
    batches = {
        "image": x.reshape(4, 8, 28, 28, 1),
        "attrs": {k: np.asarray(v).reshape((4, 8) + np.asarray(v).shape[1:])
                  for k, v in attrs.items()},
    }
    first = None
    for e in range(6):
        state, m = trainer.run_epoch(state, batches)
        loss = float(m["neg_elbo"])
        if first is None:
            first = loss
    assert np.isfinite(loss)
    assert loss < first, (first, loss)


def test_encoder_finetuner_improves_reconstruction():
    model = BiGAN(tiny_config())
    gan = GANTrainer(model, GANTrainConfig(batch_size=8))
    gstate = gan.init_state(jax.random.PRNGKey(0))
    x, attrs = _data(32)

    ft = EncoderFinetuner(
        model, gstate.params_G,
        FinetuneConfig(learning_rate=1e-3, batch_size=8, metric="mse"),
    )
    state = ft.init_state(gstate.params_E, jax.random.PRNGKey(1))
    data = ft.upload_dataset(x, attrs)
    recs = []
    for e in range(6):
        state, m = ft.fit_epoch(state, data, jax.random.fold_in(jax.random.PRNGKey(2), e))
        recs.append(float(m["rec"]) + float(m["latent"]))
    assert recs[-1] < recs[0], recs


def test_remat_matches_no_remat():
    """GANTrainConfig(remat=True) rematerializes forwards in the backward
    pass; the computed updates must be bit-for-bit compatible (same graph
    semantics, identical rng), only the memory/FLOP trade changes."""
    x, attrs = _data(16, seed=3)
    key = jax.random.PRNGKey(7)
    metrics = {}
    states = {}
    for remat in (False, True):
        trainer = GANTrainer(
            BiGAN(tiny_config()),
            GANTrainConfig(batch_size=8, remat=remat),
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        data = trainer.upload_dataset(x, attrs)
        state, m = trainer.fit_epoch(state, data, key)
        metrics[remat] = {k: float(v) for k, v in m.items()}
        states[remat] = state
    for k in metrics[False]:
        assert np.isclose(metrics[False][k], metrics[True][k], atol=1e-5), (
            k, metrics[False][k], metrics[True][k])
    # parameters after the epoch agree too
    for a, b in zip(jax.tree_util.tree_leaves(states[False].params_G),
                    jax.tree_util.tree_leaves(states[True].params_G)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
