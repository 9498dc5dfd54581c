"""Device-side STFT / inverse STFT / Griffin-Lim (torchaudio-convention).

Replaces ``torchaudio.transforms.Spectrogram`` / ``GriffinLim`` used by all
audio loaders in the reference (``image_scms/audio_mnist.py:59-64``:
``Spectrogram(n_fft=255, win_length=128, pad=96)`` over 8000-sample wavs
gives the 128x128 "image"; whales/ESRF use other configs). Conventions
matched:

- explicit zero ``pad`` on both signal ends, then center reflect-pad by
  ``n_fft // 2``;
- periodic Hann window of ``win_length`` zero-centred inside ``n_fft``;
- power spectrogram (|.|^2) by default;
- Griffin-Lim with momentum 0.99, random phase init, 32 iterations.

Everything is jit/vmap-friendly (framing via gather of a static index
matrix; the Griffin-Lim loop is a ``lax.fori_loop``), so spectrogram
computation fuses into the device input pipeline instead of re-entering the
host every batch like the reference (SURVEY §3.4).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def host_prep(fn, audio: np.ndarray, *args) -> np.ndarray:
    """Run a loader's spectrogram transform on the host CPU backend.

    Loader STFTs are data *preparation*: their output is immediately
    fetched back to host numpy to assemble batches. Executing them on
    the default accelerator round-trips every spectrogram batch through
    device->host — over the axon tunnel that leg runs at ~KB/s and
    dominated the ESRF 512^2 eval wall-clock (16 MB per batch of 16).
    The CPU backend coexists with the TPU plugin, so prep runs there;
    if it is unavailable, fall back to the default device.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return np.asarray(fn(jnp.asarray(audio), *args))
    with jax.default_device(cpu):
        return np.asarray(fn(jnp.asarray(audio), *args))


def hann_window(win_length: int, periodic: bool = True) -> jnp.ndarray:
    n = win_length + 1 if periodic else win_length
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n) / (n - 1)))
    return w[:win_length] if periodic else w


@dataclasses.dataclass(frozen=True)
class StftConfig:
    n_fft: int = 255
    win_length: int = 128
    hop_length: Optional[int] = None  # default win_length // 2 (torchaudio)
    pad: int = 0  # extra zero padding on both ends
    power: float = 2.0
    center: bool = True

    @property
    def hop(self) -> int:
        return self.hop_length if self.hop_length is not None else self.win_length // 2

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def n_frames(self, n_samples: int) -> int:
        n = n_samples + 2 * self.pad
        if self.center:
            n += 2 * (self.n_fft // 2)
        return 1 + (n - self.n_fft) // self.hop

    def padded_window(self) -> jnp.ndarray:
        """win_length window zero-centred in an n_fft frame (torchaudio
        pads the window symmetrically to n_fft)."""
        w = hann_window(self.win_length)
        left = (self.n_fft - self.win_length) // 2
        return jnp.pad(w, (left, self.n_fft - self.win_length - left))


def _frame(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) frames after padding."""
    if cfg.pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(cfg.pad, cfg.pad)])
    if cfg.center:
        c = cfg.n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(c, c)], mode="reflect")
    n = x.shape[-1]
    nf = 1 + (n - cfg.n_fft) // cfg.hop
    idx = (np.arange(nf)[:, None] * cfg.hop + np.arange(cfg.n_fft)[None, :])
    return x[..., idx]


def stft(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """(..., T) -> complex (..., n_freqs, n_frames)."""
    frames = _frame(x, cfg) * cfg.padded_window()
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def spectrogram(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """Power (or magnitude) spectrogram, (..., n_freqs, n_frames)."""
    s = jnp.abs(stft(x, cfg))
    return s if cfg.power == 1.0 else s ** cfg.power


def istft(spec: jnp.ndarray, cfg: StftConfig, length: Optional[int] = None) -> jnp.ndarray:
    """Complex (..., n_freqs, n_frames) -> (..., T) via windowed overlap-add
    with squared-window normalisation."""
    win = cfg.padded_window()
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=cfg.n_fft, axis=-1)
    frames = frames * win

    nf = frames.shape[-2]
    total = cfg.n_fft + cfg.hop * (nf - 1)
    starts = np.arange(nf) * cfg.hop
    idx = starts[:, None] + np.arange(cfg.n_fft)[None, :]

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, nf, cfg.n_fft))
    out = jnp.zeros((flat.shape[0], total))
    out = out.at[:, idx.reshape(-1)].add(flat.reshape((flat.shape[0], -1)))

    norm = jnp.zeros((total,))
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(win**2, nf))
    out = out / jnp.maximum(norm, 1e-11)

    out = out.reshape(batch_shape + (total,))
    # undo center + explicit pad
    start = (cfg.n_fft // 2 if cfg.center else 0) + cfg.pad
    if length is None:
        end = total - start
    else:
        end = start + length
    return out[..., start:end]


@partial(jax.jit, static_argnames=("cfg", "n_iter", "length"))
def griffin_lim(
    spec: jnp.ndarray,
    cfg: StftConfig,
    rng: Optional[jax.Array] = None,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Phase reconstruction from a power/magnitude spectrogram
    (torchaudio GriffinLim semantics: random phase init, momentum 0.99)."""
    mag = spec ** (1.0 / cfg.power)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    angle = jax.random.uniform(rng, mag.shape, minval=-jnp.pi, maxval=jnp.pi)
    s = mag * jnp.exp(1j * angle)
    m = momentum / (1.0 + momentum)

    def body(_, carry):
        s, prev = carry
        inv = istft(s, cfg, length=length)
        rebuilt = stft(inv, cfg)
        update = rebuilt - m * prev
        phase = update / jnp.maximum(jnp.abs(update), 1e-16)
        return mag * phase, rebuilt

    s, _ = jax.lax.fori_loop(0, n_iter, body, (s, jnp.zeros_like(s)))
    return istft(s, cfg, length=length)
