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


def test_finetuner_remat_matches_no_remat():
    """FinetuneConfig(remat=True) (the 512^2 ESRF fine-tune mode) is a pure
    memory/FLOP trade: identical rng and data must give the same params."""
    model = BiGAN(tiny_config())
    gan = GANTrainer(model, GANTrainConfig(batch_size=8))
    gstate = gan.init_state(jax.random.PRNGKey(0))
    x, attrs = _data(16, seed=4)
    outs = {}
    for remat in (False, True):
        ft = EncoderFinetuner(
            model, gstate.params_G,
            FinetuneConfig(learning_rate=1e-3, batch_size=8, metric="ssim",
                           remat=remat),
        )
        # fresh buffer copies: the epoch program donates its state arg, so
        # reusing gstate.params_E across the two runs would hit deleted arrays
        p_e = jax.tree_util.tree_map(jnp.array, gstate.params_E)
        state = ft.init_state(p_e, jax.random.PRNGKey(1))
        data = ft.upload_dataset(x, attrs)
        for e in range(2):
            state, m = ft.fit_epoch(
                state, data, jax.random.fold_in(jax.random.PRNGKey(2), e))
        outs[remat] = (jax.tree_util.tree_leaves(state.params_E), float(m["rec"]))
    for a, b in zip(outs[False][0], outs[True][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert abs(outs[False][1] - outs[True][1]) < 1e-6


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


# ---------------------------------------------------------------------------
# Multi-device (1-vs-8) coverage beyond the MNIST BiGAN (VERDICT r2 item 3):
# audio BiGAN incl. the spectrogram pipeline, VAE, classifier and
# unconditional-GAN trainers must produce identical trajectories on a
# 1-device and an 8-device mesh.
# ---------------------------------------------------------------------------


def _traj_close(traj, rtol=2e-3, atol=2e-4):
    a, b = traj[1], traj[8]
    assert np.allclose(a, b, rtol=rtol, atol=atol), (
        np.abs(a - b).max(), a, b)


def test_dp_audio_bigan_spect_pipeline_1v8():
    """Audio BiGAN (128-squared config, tiny width) fed through the real
    spectrogram pipeline: wave -> framed STFT -> log-spect -> per-column
    SpectStats (computed on the sharded array, exercising cross-device
    reductions) -> clip-normalize -> train."""
    from imagecfgen_tpu.data.audio_mnist import spectrogram_batch
    from imagecfgen_tpu.models.bigan import audio_mnist_bigan_config
    from imagecfgen_tpu.ops.spectral import SpectStats
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES

    rng = np.random.default_rng(3)
    n = 16
    waves = rng.normal(0, 0.3, (n, 8000)).astype(np.float32)
    spects = np.asarray(spectrogram_batch(jnp.asarray(waves)))  # (N, F, T)
    attrs = {
        k: np.eye(card, dtype=np.float32)[rng.integers(0, card, n)]
        for k, card in CARDINALITIES.items()
    }
    cfg = audio_mnist_bigan_config(d=2)
    traj, stats_by_mesh = {}, {}
    for ndev in (1, 8):
        mesh = data_mesh(jax.devices()[:ndev])
        trainer = GANTrainer(
            BiGAN(cfg),
            GANTrainConfig(batch_size=8, betas=(0.5, 0.9)),
            mesh=mesh,
        )
        sharded = jax.device_put(
            jnp.asarray(spects),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        )
        stats = SpectStats.compute(sharded)  # cross-device reduction
        stats_by_mesh[ndev] = np.asarray(stats.mean), np.asarray(stats.std)
        imgs = np.asarray(stats.spect_to_img(sharded))[..., None]
        state = trainer.init_state(jax.random.PRNGKey(0))
        data = trainer.upload_dataset(imgs[:, :128, :128, :], attrs)
        losses = []
        for e in range(2):
            state, m = trainer.fit_epoch(state, data, jax.random.PRNGKey(50 + e))
            losses.append([float(m["loss_D"]), float(m["loss_EG"])])
        traj[ndev] = np.asarray(losses)
    assert np.allclose(stats_by_mesh[1][0], stats_by_mesh[8][0], atol=1e-6)
    # the STFT pad column is constant across samples, so its std is pure
    # f32 rounding noise (~1e-5) whose value depends on reduction order;
    # 1e-4 absolute still pins every real (O(1)-std) column to 6 digits
    assert np.allclose(stats_by_mesh[1][1], stats_by_mesh[8][1], atol=1e-4)
    _traj_close(traj)


def test_dp_vae_trainer_1v8():
    x, attrs = _data(32)
    traj = {}
    for ndev in (1, 8):
        mesh = data_mesh(jax.devices()[:ndev])
        trainer = VAETrainer(
            ConditionalVAE(tiny_vae_config()),
            VAETrainConfig(batch_size=16, kl_weight=1.0),
            mesh=mesh,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        batches = {
            "image": x.reshape(2, 16, 28, 28, 1),
            "attrs": {k: np.asarray(v).reshape((2, 16) + np.asarray(v).shape[1:])
                      for k, v in attrs.items()},
        }
        losses = []
        for e in range(3):
            state, m = trainer.run_epoch(state, batches)
            losses.append(float(m["neg_elbo"]))
        traj[ndev] = np.asarray(losses)
    _traj_close(traj)


def test_dp_classifier_trainer_1v8():
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config
    from imagecfgen_tpu.train.clf_trainer import (
        SupervisedTrainConfig, SupervisedTrainer)

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (64, 28, 28, 1)).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.integers(0, 10, 64)]
    traj = {}
    for ndev in (1, 8):
        mesh = data_mesh(jax.devices()[:ndev])
        trainer = SupervisedTrainer(
            CNNClassifier(mnist_classifier_config()),
            SupervisedTrainConfig(batch_size=16),
            mesh=mesh,
        )
        state = trainer.init_state(jax.random.PRNGKey(0), jnp.zeros((2, 28, 28, 1)))
        data = trainer.upload_dataset(x, y)
        losses = []
        for e in range(3):
            state, m = trainer.fit_epoch(state, data, jax.random.PRNGKey(70 + e))
            losses.append(float(m["loss"]))
        traj[ndev] = np.asarray(losses)
    _traj_close(traj)


def test_dp_uncond_gan_trainer_1v8():
    from imagecfgen_tpu.models.gan import UncondGANConfig
    from imagecfgen_tpu.train.uncond_gan_trainer import (
        UncondGANTrainConfig, UncondGANTrainer)

    rng = np.random.default_rng(6)
    x = rng.uniform(-1, 1, (32, 128, 128, 1)).astype(np.float32)
    cfg = UncondGANConfig(d=2, latent_dim=16)  # plan is fixed at 128^2
    traj = {}
    for ndev in (1, 8):
        mesh = data_mesh(jax.devices()[:ndev])
        trainer = UncondGANTrainer(
            cfg, UncondGANTrainConfig(batch_size=16), mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        data = trainer.upload_dataset(x)
        losses = []
        for e in range(3):
            state, m = trainer.fit_epoch(state, data, jax.random.PRNGKey(90 + e))
            losses.append([float(m["loss_D"]), float(m["loss_G"])])
        traj[ndev] = np.asarray(losses)
    _traj_close(traj)


def test_flat_adam_matches_reference_trajectory():
    """GANTrainConfig(flat_adam=True) is a pure kernel-shape change: the
    raveled-moment Adam must reproduce the per-leaf optax.adam trajectory
    bit-for-bit-ish (same math, same order within each leaf)."""
    x, attrs = _data(32)
    traj = {}
    for flat in (False, True):
        trainer = GANTrainer(
            BiGAN(tiny_config()),
            GANTrainConfig(batch_size=16, flat_adam=flat),
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        data = trainer.upload_dataset(x, attrs)
        losses = []
        for e in range(3):
            state, m = trainer.fit_epoch(state, data, jax.random.PRNGKey(10 + e))
            losses.append([float(m["loss_D"]), float(m["loss_EG"])])
        traj[flat] = np.asarray(losses)
    assert np.allclose(traj[False], traj[True], rtol=1e-4, atol=1e-5), traj


def test_fused_d_steps_trains():
    """The fused single-update D step (throughput mode) trains: finite
    losses, D/EG scores in (0, 1), step counter advances."""
    x, attrs = _data(32)
    trainer = GANTrainer(
        BiGAN(tiny_config()),
        GANTrainConfig(batch_size=16, fused_d_steps=True, flat_adam=True),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    for e in range(3):
        state, m = trainer.fit_epoch(state, data, jax.random.PRNGKey(30 + e))
    assert np.isfinite(float(m["loss_D"])) and np.isfinite(float(m["loss_EG"]))
    assert 0.0 < float(m["D_score"]) < 1.0
    assert int(state.step) == 6


def test_batch_clamped_to_tiny_dataset():
    """A dataset smaller than one configured batch trains anyway: the first
    fit_epoch clamps the compiled batch to the largest mesh-even size that
    fits (the reference's torch loop simply emits one short batch —
    training_utils.batchify — so its CLI commands work on tiny data; ours
    must too), and later epochs reuse the clamped program."""
    import pytest

    from imagecfgen_tpu.train._guards import resolve_batch

    x, attrs = _data(16)
    trainer = GANTrainer(BiGAN(tiny_config()), GANTrainConfig(batch_size=64))
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    for e in range(2):
        state, m = trainer.fit_epoch(state, data, jax.random.PRNGKey(e))
    assert np.isfinite(float(m["loss_D"]))
    # 16 samples on the 8-device mesh -> clamp to 16, one step per epoch
    assert trainer._fit_batch == 16
    assert int(state.step) == 2
    # unfillable: fewer samples than mesh devices
    with pytest.raises(ValueError):
        resolve_batch(trainer.mesh.size - 1, 64, trainer.mesh.size)
    # post-compile invariant still guards a shrunken dataset
    tiny, tattrs = _data(8)
    with pytest.raises(ValueError):
        trainer.fit_epoch(state, trainer.upload_dataset(tiny, tattrs),
                          jax.random.PRNGKey(9))
