"""Polyphase audio resampling (host-side, ingest path).

The reference resamples AudioMNIST wavs 48 kHz -> 8 kHz with
``librosa.core.resample`` (``image_scms/audio_mnist.py:77-79``), whose
backend is a polyphase FIR resampler. Round 1 used FFT-domain
``scipy.signal.resample``, which has different ringing/aliasing behaviour
on speech — a parity deviation flagged by the round-1 review. This is a
from-scratch polyphase implementation (Kaiser-windowed sinc low-pass +
zero-stuff/filter/decimate) matching ``scipy.signal.resample_poly``'s
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


def resample(wav: np.ndarray, sr_in: int, sr_out: int, beta: float = 5.0) -> np.ndarray:
    """Rate-to-rate convenience wrapper (e.g. 48000 -> 8000)."""
    if sr_in == sr_out:
        return np.asarray(wav, dtype=np.float64).copy()
    g = gcd(sr_in, sr_out)
    return resample_poly(wav, sr_out // g, sr_in // g, beta=beta)
