import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.ops.spectral import SpectStats
from imagecfgen_tpu.ops.stft import StftConfig, griffin_lim, istft, spectrogram, stft

AUDIO_CFG = StftConfig(n_fft=255, win_length=128, pad=96)  # AudioMNIST config


def test_audio_mnist_spectrogram_is_128x128():
    x = jnp.zeros((3, 8000))
    s = spectrogram(x, AUDIO_CFG)
    assert s.shape == (3, 128, 128)
    assert AUDIO_CFG.n_freqs == 128
    assert AUDIO_CFG.n_frames(8000) == 128


def test_whale_spectrogram_shape():
    # whalecalls.py:52-55: n_fft=511, win=128, hop=24, pad=64 over 3s@8k?
    cfg = StftConfig(n_fft=511, win_length=128, hop_length=24, pad=64)
    assert cfg.n_freqs == 256
    n_samples = 256 * 24 - 2 * 64 - 2 * (511 // 2) + 511 - 24  # solve for 256 frames
    assert cfg.n_frames(n_samples) == 256


def test_stft_parseval_sine():
    """Energy of a sine concentrates at its frequency bin."""
    cfg = StftConfig(n_fft=256, win_length=256, hop_length=64, center=False)
    t = np.arange(2048) / 8000.0
    f = 1000.0
    x = jnp.asarray(np.sin(2 * np.pi * f * t).astype(np.float32))[None]
    s = np.asarray(spectrogram(x, cfg))[0]  # (129, frames)
    peak_bin = s.mean(axis=1).argmax()
    expected_bin = round(f / 8000.0 * 256)
    assert abs(int(peak_bin) - expected_bin) <= 1


def test_istft_inverts_stft():
    cfg = StftConfig(n_fft=255, win_length=128, pad=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 4000)).astype(np.float32))
    spec = stft(x, cfg)
    x2 = istft(spec, cfg, length=4000)
    assert x2.shape == x.shape
    # COLA region (away from edges) should reconstruct near-exactly
    err = np.abs(np.asarray(x2)[:, 200:-200] - np.asarray(x)[:, 200:-200]).max()
    assert err < 1e-3, err


def test_griffin_lim_recovers_tone():
    """GL from the power spectrogram of a pure tone should produce a signal
    whose spectrogram matches the target closely."""
    cfg = StftConfig(n_fft=255, win_length=128)
    t = np.arange(4000) / 8000.0
    x = jnp.asarray((0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))[None]
    target = spectrogram(x, cfg)
    rec = griffin_lim(target, cfg, rng=jax.random.PRNGKey(0), n_iter=32)
    rec_spec = spectrogram(rec, cfg)
    # compare normalized spectrogram shapes
    a = np.asarray(target).ravel()
    b = np.asarray(rec_spec[..., : target.shape[-1]]).ravel()[: a.size]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_spect_stats_roundtrip_and_clip():
    rng = np.random.default_rng(0)
    spects = jnp.asarray(rng.normal(2.0, 1.5, (64, 128, 128)).astype(np.float32))
    stats = SpectStats.compute(spects)
    img = stats.spect_to_img(spects)
    assert float(jnp.abs(img).max()) <= 1.0 + 1e-6
    # within +-3 sigma the mapping is invertible
    back = stats.img_to_spect(img)
    inside = np.abs(np.asarray(spects) - np.asarray(stats.mean)) < 2.9 * np.asarray(stats.std)
    diff = np.abs(np.asarray(back) - np.asarray(spects))[inside]
    assert diff.max() < 1e-2

    # streaming stats agree with one-shot
    stats2 = SpectStats.compute_batched([np.asarray(spects[:32]), np.asarray(spects[32:])])
    assert np.allclose(np.asarray(stats2.mean), np.asarray(stats.mean), atol=1e-4)
