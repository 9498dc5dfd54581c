"""Spectrogram normalisation: the clip(+-3 std)/3 idiom.

Every audio trainer in the reference runs one full data pass accumulating
per-time-column mean and E[X^2] of the log-spectrogram, then maps
``spect_to_img = clip((x - mu) / (sigma + 1e-6), -3, 3) / 3`` and back
(``image_scms/audio_mnist.py:347-366``; identical at ``whalecalls.py:423-441``
and ``esrf_acoustic.py:298-323``, and re-implemented in 15+ scripts). Here
it is one jitted reduction + a SpectStats pytree that serialises with
checkpoints (scorers reload stats from ``.npy`` prefixes in the reference —
``classifiers/audio_mnist.py:200-219`` — which ``save``/``load`` cover).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SpectStats:
    mean: jnp.ndarray  # (1, 1, T)
    std: jnp.ndarray   # (1, 1, T)
    stds_kept: float = 3.0

    def tree_flatten(self):
        return (self.mean, self.std), self.stds_kept

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @staticmethod
    def compute(spects: jnp.ndarray, stds_kept: float = 3.0) -> "SpectStats":
        """``spects``: (N, F, T) log-spectrograms. Stats reduce over
        (sample, frequency) leaving per-time-column stats, matching the
        reference's ``mean(dim=(0, 1))`` (``image_scms/audio_mnist.py:353-354``).

        Variance is two-pass ``E[(X - mean)^2]`` rather than the
        reference's streaming ``E[X^2] - E[X]^2``: on near-constant
        columns (the STFT pad region) the one-pass form is
        cancellation-dominated in f32 and its value depends on the
        cross-device reduction order, breaking 1-vs-N-mesh
        reproducibility (``compute_batched`` keeps the reference's
        streaming semantics for the host path)."""
        mean = spects.mean(axis=(0, 1)).reshape((1, 1, -1))
        var = ((spects - mean) ** 2).mean(axis=(0, 1)).reshape((1, 1, -1))
        std = jnp.sqrt(var)
        return SpectStats(mean, std, stds_kept)

    @staticmethod
    def compute_batched(batches) -> "SpectStats":
        """Streaming variant over an iterable of (B, F, T) arrays — the
        reference's one-pass accumulation loop."""
        n, mean, ss = 0, 0.0, 0.0
        for b in batches:
            n += 1
            mean = mean + np.asarray(b).mean(axis=(0, 1)).reshape((1, 1, -1))
            ss = ss + (np.asarray(b) ** 2).mean(axis=(0, 1)).reshape((1, 1, -1))
        mean, ss = mean / n, ss / n
        return SpectStats(
            jnp.asarray(mean), jnp.asarray(np.sqrt(np.maximum(ss - mean**2, 0.0)))
        )

    def spect_to_img(self, spect: jnp.ndarray) -> jnp.ndarray:
        z = (spect - self.mean) / (self.std + 1e-6)
        return jnp.clip(z, -self.stds_kept, self.stds_kept) / self.stds_kept

    def img_to_spect(self, img: jnp.ndarray) -> jnp.ndarray:
        return img * self.stds_kept * (self.std + 1e-6) + self.mean

    # ------------------------------------------------------- persistence

    def save(self, prefix: str) -> None:
        np.save(prefix + "-mean.npy", np.asarray(self.mean))
        np.save(prefix + "-std.npy", np.asarray(self.std))

    @staticmethod
    def load(prefix: str, stds_kept: float = 3.0) -> "SpectStats":
        return SpectStats(
            jnp.asarray(np.load(prefix + "-mean.npy")),
            jnp.asarray(np.load(prefix + "-std.npy")),
            stds_kept,
        )
