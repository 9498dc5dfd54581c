"""Shared plumbing for the AudioMNIST CLI scripts.

Artifacts:

- ``audio-mnist-bigan.tar``      BiGAN params + spectrogram stats + vocabs
- ``audio-mnist-attribute-scm.tar``  causal graph params
- ``audio-mnist-{attr}-clf.tar`` attribute classifier + stats (the
  reference stores stats as npy prefixes next to the classifier,
  ``classifiers/audio_mnist.py:200-219`` — kept in one checkpoint here)
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import clean_exit  # installs the CLI excepthook
from ..core.checkpoint import load_checkpoint, save_checkpoint
from ..data.audio_mnist import VALIDATION_RUNS, AudioMNISTData
from ..ops.spectral import SpectStats
from ..scm.audio_mnist import AudioMNISTAttributeSCM


def load_audio_dataset(zip_path: Optional[str], synthetic_runs: int = 4) -> AudioMNISTData:
    if zip_path and os.path.exists(zip_path):
        return AudioMNISTData(path_to_zip=zip_path)
    if zip_path:
        print(f"warning: {zip_path} not found; using the synthetic AudioMNIST stand-in")
    return AudioMNISTData(path_to_zip=None, synthetic_runs=synthetic_runs)


def prepare_training_arrays(
    data: AudioMNISTData, excluded_runs=None
) -> Tuple[np.ndarray, Dict[str, np.ndarray], SpectStats]:
    """(images in [-1,1] NHWC, one-hot attr dict, stats) for training.
    Default exclusion: the dataset's validation runs (VALIDATION_RUNS
    intersected with observed runs)."""
    if excluded_runs is None:
        excluded_runs = data.training_excluded_runs
    spects, attrs, _ = data.all_spectrograms(excluded_runs=excluded_runs)
    stats = SpectStats.compute(jnp.asarray(spects))
    imgs = np.asarray(stats.spect_to_img(jnp.asarray(spects)))[..., None]
    return imgs.astype(np.float32), attrs, stats


def save_audio_bigan(path: str, state, stats: SpectStats, data: AudioMNISTData, meta=None):
    tree = {
        "params_E": state.params_E,
        "params_G": state.params_G,
        "vars_D": state.vars_D,
        "opt_eg": state.opt_eg,
        "opt_d": state.opt_d,
        "step": state.step,
        "spect_mean": np.asarray(stats.mean),
        "spect_std": np.asarray(stats.std),
    }
    # per-step noise stream; needed for bit-faithful resume (absent on
    # adapter objects, e.g. the finetune scripts' converted trees)
    rng = getattr(state, "rng", None)
    if rng is not None:
        tree["rng"] = rng
    m = {"kind": "bigan-audio-mnist", "vocabs": _vocab_meta(data),
         "carries_rng": rng is not None, **(meta or {})}
    save_checkpoint(path, tree, meta=m)


def load_audio_bigan(path: str):
    tree, meta = load_checkpoint(path)
    stats = SpectStats(jnp.asarray(tree["spect_mean"]), jnp.asarray(tree["spect_std"]))
    return tree, stats, meta


def _vocab_meta(data: AudioMNISTData) -> Dict:
    out = {k: list(map(str, v.categories)) for k, v in data.vocabs.items()}
    out["age_edges"] = [float(e) for e in data.age_binner.edges]
    return out


def save_audio_scm(path: str, scm: AudioMNISTAttributeSCM):
    save_checkpoint(path, scm.state_dict(), meta={"kind": "attribute-scm-audio-mnist"})


def load_audio_scm(path: str) -> AudioMNISTAttributeSCM:
    tree, _ = load_checkpoint(path)
    return AudioMNISTAttributeSCM.from_state_dict(tree)
