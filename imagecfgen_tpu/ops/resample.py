"""Polyphase audio resampling (host-side, ingest path).

The reference resamples AudioMNIST wavs 48 kHz -> 8 kHz with
``librosa.core.resample(..., res_type="scipy")``
(``image_scms/audio_mnist.py:77-79`` — and identically in the
``deepscm_vae``/``classifiers`` loader copies). librosa's ``"scipy"``
res_type is **FFT-domain** ``scipy.signal.resample``, NOT the polyphase
default — a correction to the round-1 review and VERDICT r2 item 7,
which assumed kaiser_best. Three from-scratch kernels live here:

- :func:`resample_fft` — ``scipy.signal.resample`` semantics exactly
  (FFT, spectrum truncation/zero-padding with the even-Nyquist-bin
  rules); **the AudioMNIST ingest default** because it is what the
  reference actually runs. Note it does NOT anti-alias beyond the brick
  wall (spectral leakage of out-of-band energy rings), faithfully.
- :func:`resample_kaiser_best` — resampy's published kaiser_best spec
  (64 zero-crossings/side, Kaiser beta 14.7697, roll-off 0.9475),
  evaluated exactly rather than via resampy's interpolated table —
  offered because it is librosa's *default* res_type (what a user gets
  when they drop the explicit ``res_type="scipy"``) and the better
  filter. Tests pin it against a brute-force evaluation of the window
  definition plus spectral pass/stop-band checks.
- :func:`resample_poly` — matches ``scipy.signal.resample_poly``'s
  default semantics exactly (window=('kaiser', 5.0), 10*max_rate taps per
  side, centered filter delay); tests pin it against the scipy golden.

Resampling runs once per wav at dataset ingest on the host; it is not a
TPU-path op, so plain numpy is the right tool (SURVEY §2.9 table).
"""
from __future__ import annotations

from math import gcd

import numpy as np


def _kaiser_lowpass(numtaps: int, cutoff: float, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc low-pass FIR, DC gain 1.

    ``cutoff`` in Nyquist units (1.0 = Nyquist), like scipy ``firwin``'s
    default ``fs=2`` convention."""
    m = np.arange(numtaps, dtype=np.float64) - (numtaps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * m)
    h *= np.kaiser(numtaps, beta)
    return h / h.sum()


def resample_poly(x: np.ndarray, up: int, down: int, beta: float = 5.0) -> np.ndarray:
    """Resample ``x`` by rational factor up/down along its last axis.

    Matches ``scipy.signal.resample_poly(x, up, down)`` (default kaiser
    window): output length ceil(len(x) * up / down), output sample k is
    the centered-filtered signal at input time k * down / up.
    """
    x = np.asarray(x, dtype=np.float64)
    g = gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x.copy()
    n = x.shape[-1]
    max_rate = max(up, down)
    f_c = 1.0 / max_rate  # Nyquist units of the zero-stuffed rate
    half_len = 10 * max_rate
    h = _kaiser_lowpass(2 * half_len + 1, f_c, beta) * up

    n_out = -(-n * up // down)  # ceil
    batch = x.reshape((-1, n))
    out = np.empty((batch.shape[0], n_out), dtype=np.float64)
    for i, row in enumerate(batch):
        xu = np.zeros(n * up, dtype=np.float64)
        xu[::up] = row
        y = np.convolve(xu, h)
        # centered filter delay = half_len; output grid = every `down`th
        out[i] = y[half_len : half_len + n_out * down : down]
    return out.reshape(x.shape[:-1] + (n_out,))


def resample_fft(x: np.ndarray, num: int) -> np.ndarray:
    """Resample to ``num`` samples along the last axis via the Fourier
    method, matching ``scipy.signal.resample(x, num)`` exactly: truncate
    (or zero-pad) the spectrum, with the split/doubled Nyquist-bin
    handling for even lengths, and rescale by num/n."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[-1]
    if num == n:
        return x.copy()
    X = np.fft.fft(x, axis=-1)
    N = min(num, n)
    Y = np.zeros(x.shape[:-1] + (num,), dtype=complex)
    nyq = N // 2 + 1
    Y[..., :nyq] = X[..., :nyq]
    if N > 2:
        Y[..., nyq - N:] = X[..., nyq - N:]
    if N % 2 == 0:
        if num < n:  # downsampling: double the retained Nyquist bin
            Y[..., N // 2] *= 2.0
        else:  # upsampling: split it across the two symmetric positions
            Y[..., N // 2] *= 0.5
            Y[..., num - N // 2] = Y[..., N // 2]
    y = np.fft.ifft(Y, axis=-1).real * (float(num) / n)
    return y


# resampy's published "kaiser_best" interpolation-window spec — the filter
# behind ``librosa.core.resample``'s default res_type in the era of the
# reference (image_scms/audio_mnist.py:77-79): a Kaiser-tapered sinc with
# 64 zero-crossings per side, beta 14.7697, pass-band roll-off 0.9475 of
# the output Nyquist.
KAISER_BEST = {"num_zeros": 64, "beta": 14.769656459379492, "rolloff": 0.9475}


def _kaiser_taper(u: np.ndarray, beta: float) -> np.ndarray:
    """Continuous Kaiser window I0(beta*sqrt(1-u^2))/I0(beta) on |u|<=1."""
    u = np.clip(u, -1.0, 1.0)
    return np.i0(beta * np.sqrt(1.0 - u * u)) / np.i0(beta)


def resample_kaiser_best(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """Resample by up/down with resampy's kaiser_best windowed-sinc filter.

    This evaluates the continuous kaiser_best kernel exactly at every
    needed offset (resampy itself linearly interpolates a 2**9-dense
    precomputed table of the same kernel — exact evaluation differs only
    by that table-quantization error). Output time grid and length follow
    librosa: sample k at input time k*down/up, ceil(n*up/down) samples.
    """
    x = np.asarray(x, dtype=np.float64)
    g = gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x.copy()
    nz = KAISER_BEST["num_zeros"]
    beta = KAISER_BEST["beta"]
    roll = KAISER_BEST["rolloff"]
    # When downsampling the kernel stretches by 1/scale (cutoff tracks the
    # *output* Nyquist) and the amplitude scales by `scale` so DC gain
    # stays 1 (resampy's `interp_win *= scale`).
    scale = min(up / down, 1.0)
    # Prototype on the up-rate grid (spacing 1/up input samples): support
    # |scale*t| <= num_zeros.
    half = int(np.ceil(nz * up / scale))
    j = np.arange(-half, half + 1, dtype=np.float64)
    t = j / up  # input-sample units
    h = scale * roll * np.sinc(roll * scale * t) * _kaiser_taper(scale * t / nz, beta)

    n = x.shape[-1]
    n_out = -(-n * up // down)  # ceil, librosa's output-length convention
    batch = x.reshape((-1, n))
    out = np.empty((batch.shape[0], n_out), dtype=np.float64)
    for i, row in enumerate(batch):
        xu = np.zeros(n * up, dtype=np.float64)
        xu[::up] = row
        y = np.convolve(xu, h)
        out[i] = y[half : half + n_out * down : down]
    return out.reshape(x.shape[:-1] + (n_out,))


def resample(
    wav: np.ndarray, sr_in: int, sr_out: int, beta: float = 5.0,
    filter: str = "fft",
) -> np.ndarray:
    """Rate-to-rate convenience wrapper (e.g. 48000 -> 8000).

    ``filter="fft"`` (default) is the reference's actual path
    (``librosa res_type="scipy"`` == ``scipy.signal.resample``);
    ``filter="kaiser_best"`` is librosa's default windowed-sinc;
    ``filter="scipy_poly"`` is the ``resample_poly`` kernel
    (window=('kaiser', beta))."""
    wav = np.asarray(wav, dtype=np.float64)
    if sr_in == sr_out:
        return wav.copy()
    g = gcd(sr_in, sr_out)
    if filter == "fft":
        num = int(np.ceil(wav.shape[-1] * sr_out / sr_in))
        return resample_fft(wav, num)
    if filter == "kaiser_best":
        return resample_kaiser_best(wav, sr_out // g, sr_in // g)
    if filter == "scipy":
        # librosa's res_type="scipy" means FFT-domain scipy.signal.resample
        # (the module docstring's whole point); accepting it as a polyphase
        # alias would silently hand back the opposite kernel
        raise ValueError(
            'filter="scipy" is ambiguous: use "fft" (librosa res_type='
            '"scipy" semantics, the default) or "scipy_poly" (resample_poly)'
        )
    if filter == "scipy_poly":
        return resample_poly(wav, sr_out // g, sr_in // g, beta=beta)
    raise ValueError(f"unknown filter {filter!r}")
