import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.data.esrf import (
    EsrfStation,
    distance_from_bg_columns,
    esrf_spectrogram_batch,
)
from imagecfgen_tpu.data.whalecalls import (
    WhaleCallData,
    signaltonoise,
    whale_spectrogram_batch,
)
from imagecfgen_tpu.models.gan import UncondGANConfig
from imagecfgen_tpu.train.uncond_gan_trainer import UncondGANTrainConfig, UncondGANTrainer


def test_whale_synthetic_stream_shapes():
    data = WhaleCallData(synthetic_clips_per_class=8)
    batch = next(data.stream(batch_size=12, mode="train", seed=0))
    assert batch["audio"].shape == (12, 256, 256)
    assert batch["call_type"].shape == (12, 3)
    assert np.isfinite(batch["audio"]).all()
    val = next(data.stream(batch_size=4, mode="validation", seed=0))
    assert val["audio"].shape[0] == 4


def test_whale_upcall_distinguishable_from_noise():
    data = WhaleCallData(synthetic_clips_per_class=6)
    clips, labels = data._synthetic["train"]
    specs = np.asarray(whale_spectrogram_batch(jnp.asarray(clips)))
    # upcall clips should put energy in the 100-400 Hz band mid-file
    band = slice(26, 90)  # bins of 2000/512 ~= 3.9 Hz -> 100-350 Hz band
    band_energy = np.exp(specs)[:, band, :].mean(axis=(1, 2))
    up = band_energy[labels == 2].mean()
    no = band_energy[labels == 0].mean()
    assert up > 2 * no


def test_signaltonoise_matches_definition():
    a = np.array([1.0, 2.0, 3.0])
    assert np.isclose(signaltonoise(a), a.mean() / a.std())
    assert signaltonoise(np.zeros(4)) == 0


def test_esrf_distance_feature():
    bg = np.zeros((3, 101))
    bg[0, 80] = 1  # closest index 80 -> distance 20
    bg[1, 95] = 2
    bg[1, 70] = 1  # max active idx 95 -> distance 5
    d = distance_from_bg_columns(bg)
    assert d[0] == 20 and d[1] == 5 and d[2] == -1


def test_esrf_synthetic_stream_shapes():
    data = EsrfStation(synthetic_recordings=16)
    batch = next(data.stream(batch_size=8, mode="train", seed=0))
    assert batch["audio"].shape[1:] == (512, 512)
    assert batch["has_boat"].shape[1] == 2
    # closest_boat scaled to [-1, 1]
    assert (np.abs(batch["closest_boat"]) <= 1.0 + 1e-6).all()
    # boat-positive recordings contribute 10 windows each
    assert batch["audio"].shape[0] >= 8 or batch["audio"].shape[0] > 0


@pytest.mark.slow
def test_uncond_gan_trainer_step_small():
    cfg = UncondGANConfig(latent_dim=16, d=4)
    for mode in ("gan", "wgan"):
        trainer = UncondGANTrainer(
            cfg, UncondGANTrainConfig(batch_size=8, loss_mode=mode)
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (16, 128, 128, 1)).astype(np.float32)
        data = trainer.upload_dataset(x)
        state, metrics = trainer.fit_epoch(state, data, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_D"])), mode
        # materialize before the donated state is consumed by the next epoch
        p0 = np.asarray(jax.tree_util.tree_leaves(state.params_G)[0])
        state, _ = trainer.fit_epoch(state, data, jax.random.PRNGKey(2))
        p1 = np.asarray(jax.tree_util.tree_leaves(state.params_G)[0])
        assert np.abs(p0 - p1).max() > 0, mode


def test_load_whale_dataset_synthetic_clips_passthrough():
    """--synthetic-clips on the whale CLI scripts sizes the stand-in."""
    from imagecfgen_tpu.cli.whale_common import load_whale_dataset

    data = load_whale_dataset(None, None, None, synthetic_clips=8)
    clips, labels = data._synthetic["train"]
    vclips, _ = data._synthetic["validation"]
    assert len(clips) + len(vclips) == 3 * 8
    assert len(np.unique(labels)) == 3
