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


# ---------------------------------------------------------------- torch parity
# torchaudio is absent, but torchaudio.transforms.Spectrogram(n_fft, win,
# hop, pad) is by definition F.pad(x, (pad, pad)) -> torch.stft(center=True,
# pad_mode="reflect", hann(win) zero-centred to n_fft, onesided) -> |.|^2.
# torch 2.x is installed, so torch.stft/istft pin the exact framing/window
# conventions for all three reference configs (VERDICT round-1 item 4).

import pytest

torch = pytest.importorskip("torch")

REF_CONFIGS = {
    # image_scms/audio_mnist.py:59-61
    "audio_mnist": StftConfig(n_fft=255, win_length=128, pad=96),
    # image_scms/whalecalls.py:52-55
    "whale": StftConfig(n_fft=511, win_length=128, hop_length=24, pad=64),
    # image_scms/esrf_acoustic.py:36-39
    "esrf": StftConfig(n_fft=1023, win_length=256, hop_length=79, pad=200),
}


def _torch_spectrogram(x_np, cfg):
    x = torch.from_numpy(x_np.astype(np.float64))
    if cfg.pad:
        x = torch.nn.functional.pad(x, (cfg.pad, cfg.pad))
    win = torch.hann_window(cfg.win_length, periodic=True, dtype=torch.float64)
    s = torch.stft(
        x, cfg.n_fft, hop_length=cfg.hop, win_length=cfg.win_length,
        window=win, center=cfg.center, pad_mode="reflect",
        onesided=True, return_complex=True,
    )
    return (s.abs() ** cfg.power).numpy()


@pytest.mark.parametrize("name", sorted(REF_CONFIGS))
def test_spectrogram_matches_torch(name):
    cfg = REF_CONFIGS[name]
    rng = np.random.default_rng(0)
    n = {"audio_mnist": 8000, "whale": 3000 * 1, "esrf": 20000}[name]
    x = rng.normal(0, 1, (2, n)).astype(np.float64)
    ref = _torch_spectrogram(x, cfg)
    ours = np.asarray(spectrogram(jnp.asarray(x), cfg))
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    scale = np.abs(ref).max()
    err = np.abs(ref - ours).max() / scale
    assert err < 1e-4, err


@pytest.mark.parametrize("name", sorted(REF_CONFIGS))
def test_istft_matches_torch(name):
    from imagecfgen_tpu.ops.stft import istft, stft

    cfg = REF_CONFIGS[name]
    # compare the raw (pad=0) istft against torch.istft on the same complex
    # spectrogram; the explicit `pad` is sliced off identically by both
    import dataclasses as dc

    cfg0 = dc.replace(cfg, pad=0)
    rng = np.random.default_rng(1)
    n = 6000
    x = rng.normal(0, 1, (2, n)).astype(np.float64)
    spec = np.asarray(stft(jnp.asarray(x), cfg0))
    win = torch.hann_window(cfg0.win_length, periodic=True, dtype=torch.float64)
    ref = torch.istft(
        torch.from_numpy(spec), cfg0.n_fft, hop_length=cfg0.hop,
        win_length=cfg0.win_length, window=win, center=True, length=n,
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(spec), cfg0, length=n))
    err = np.abs(ref - ours).max() / np.abs(ref).max()
    assert err < 1e-4, err


def test_resample_poly_matches_scipy():
    """ops/resample.py (from-scratch polyphase, the librosa-path
    replacement) vs the scipy.signal.resample_poly golden."""
    from scipy import signal as ss

    from imagecfgen_tpu.ops.resample import resample, resample_poly

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 48000 // 10).astype(np.float64)
    for up, down in [(1, 6), (2, 3), (3, 2), (160, 441)]:
        ref = ss.resample_poly(x, up, down)
        ours = resample_poly(x, up, down)
        assert ours.shape == ref.shape, (up, down, ours.shape, ref.shape)
        assert np.allclose(ref, ours, atol=1e-9), (
            up, down, np.abs(ref - ours).max())
    # 48k -> 8k wrapper in polyphase mode
    ref = ss.resample_poly(x, 1, 6)
    ours = resample(x, 48000, 8000, filter="scipy_poly")
    assert np.allclose(ref, ours, atol=1e-9)


def test_resample_fft_matches_scipy():
    """The AudioMNIST ingest default is the reference's ACTUAL resampler:
    ``librosa.core.resample(..., res_type="scipy")`` == FFT-domain
    ``scipy.signal.resample`` (image_scms/audio_mnist.py:77-79 — a
    correction to VERDICT r2 item 7, which assumed librosa's kaiser_best
    default). Pinned exactly against the scipy golden, including the
    even-length Nyquist-bin rules, both directions."""
    from scipy import signal as ss

    from imagecfgen_tpu.ops.resample import resample, resample_fft

    rng = np.random.default_rng(5)
    for n, num in [(14400, 2400), (1600, 267), (801, 2400), (800, 133),
                   (2400, 14400), (8, 16), (9, 4)]:
        x = rng.normal(0, 1, n)
        ref = ss.resample(x, num)
        ours = resample_fft(x, num)
        assert ours.shape == ref.shape
        assert np.allclose(ref, ours, atol=1e-9), (n, num)
    # the wrapper's librosa output-length convention (ceil) + default path
    x = rng.normal(0, 1, 14401)
    y = resample(x, 48000, 8000)
    assert y.shape == (int(np.ceil(14401 / 6)),)
    assert np.allclose(y, ss.resample(x, int(np.ceil(14401 / 6))), atol=1e-9)


def test_resample_kaiser_best_matches_window_spec():
    """The default (librosa-parity) resampler vs a brute-force evaluation
    of resampy's published kaiser_best kernel: 64 zero-crossings/side,
    Kaiser beta 14.7697, roll-off 0.9475 (VERDICT r2 item 7). The brute
    force computes y[k] = sum_m x[m] * h(k*down/up - m) directly from the
    continuous window definition, independent of the polyphase machinery."""
    from imagecfgen_tpu.ops.resample import (
        KAISER_BEST, _kaiser_taper, resample)

    rng = np.random.default_rng(3)
    n = 1200
    x = rng.normal(0, 1, n)

    def brute(x, up, down):
        nz, beta, roll = (KAISER_BEST["num_zeros"], KAISER_BEST["beta"],
                          KAISER_BEST["rolloff"])
        scale = min(up / down, 1.0)
        n_out = -(-len(x) * up // down)
        y = np.zeros(n_out)
        m = np.arange(len(x))
        for k in range(n_out):
            t = k * down / up - m
            u = scale * t / nz
            inside = np.abs(u) <= 1.0
            h = np.where(
                inside,
                scale * roll * np.sinc(roll * scale * t)
                * _kaiser_taper(u, beta),
                0.0,
            )
            y[k] = (x * h).sum()
        return y

    for up, down in [(1, 6), (2, 3), (3, 2)]:
        ref = brute(x, up, down)
        ours = resample(x, 8000 * down, 8000 * up, filter="kaiser_best")
        assert ours.shape == ref.shape
        assert np.allclose(ref, ours, atol=1e-12), np.abs(ref - ours).max()


def test_resample_kaiser_best_spectral():
    """Spectral behaviour of the kaiser_best path on 48k->8k: pass-band
    tones survive at unity gain, tones above the output Nyquist are
    suppressed into the Kaiser beta=14.77 stop-band (>=100 dB)."""
    from imagecfgen_tpu.ops.resample import resample

    sr_in, sr_out = 48000, 8000
    t = np.arange(sr_in) / sr_in

    def tone_gain(f):
        x = np.sin(2 * np.pi * f * t)
        y = resample(x, sr_in, sr_out, filter="kaiser_best")
        w = np.hanning(len(y))
        spec = np.abs(np.fft.rfft(y * w))
        f_alias = min(f % sr_out, sr_out - (f % sr_out))
        k = int(round(f_alias * len(y) / sr_out))
        lo, hi = max(k - 2, 0), min(k + 3, len(spec))
        # reference peak: a unit-amplitude tone of the same length/rate
        t8 = np.arange(len(y)) / sr_out
        ref = np.abs(np.fft.rfft(np.sin(2 * np.pi * max(f_alias, 440) * t8) * w)).max()
        return spec[lo:hi].max() / ref

    # pass-band (below rolloff * 4 kHz = 3.79 kHz): unity gain
    for f in (440, 2000, 3500):
        g = tone_gain(f)
        assert 0.97 < g < 1.03, (f, g)
    # stop-band: a 5.5 kHz tone would alias to 2.5 kHz; must be crushed
    for f in (5500, 9000):
        g = tone_gain(f)
        assert g < 1e-5, (f, g)  # >= 100 dB rejection


def test_resample_preserves_tone():
    """A 440 Hz tone survives 48k->8k with the right length and frequency."""
    from imagecfgen_tpu.ops.resample import resample

    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 440 * t)
    y = resample(x, 48000, 8000)
    assert y.shape == (8000,)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * 8000 / len(y)
    assert abs(peak_hz - 440) < 2, peak_hz


def test_host_prep_matches_direct_call():
    """host_prep (the loader data-prep path that pins spectrogram batches
    to the host CPU backend, ops/stft.py::host_prep) must be a pure
    placement decision: identical values to calling the transform on the
    default device, returned as host numpy."""
    from imagecfgen_tpu.ops.stft import host_prep

    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, 8000)).astype(np.float32)
    fn = jax.jit(lambda a: spectrogram(a, AUDIO_CFG))
    direct = np.asarray(fn(jnp.asarray(audio)))
    prepped = host_prep(fn, audio)
    assert isinstance(prepped, np.ndarray)
    np.testing.assert_array_equal(prepped, direct)
