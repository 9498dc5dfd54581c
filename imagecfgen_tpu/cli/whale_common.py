"""Shared plumbing for whale-call / ESRF CLI scripts."""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .common import clean_exit  # installs the CLI excepthook
from ..core.checkpoint import load_checkpoint, save_checkpoint
from ..data.whalecalls import WhaleCallData
from ..ops.spectral import SpectStats


def load_whale_dataset(
    nocall_dir: Optional[str], shotgun_dir: Optional[str], upcall_dir: Optional[str],
    filter_length=None, synthetic_clips: int = 32,
) -> WhaleCallData:
    if nocall_dir and os.path.isdir(nocall_dir):
        return WhaleCallData(nocall_dir, shotgun_dir, upcall_dir, filter_length=filter_length)
    if nocall_dir:
        print(f"warning: {nocall_dir} not found; using the synthetic whale-call stand-in")
    return WhaleCallData(
        filter_length=filter_length, synthetic_clips_per_class=synthetic_clips
    )


def collect_whale_arrays(
    data: WhaleCallData, mode: str = "train", max_batches: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, SpectStats]:
    """(images in [-1,1] NHWC, one-hot call types, stats)."""
    spects, calls = [], []
    for i, batch in enumerate(data.stream(batch_size=64, mode=mode)):
        spects.append(batch["audio"])
        calls.append(batch["call_type"])
        if max_batches and i + 1 >= max_batches:
            break
    spects = np.concatenate(spects, axis=0)
    calls = np.concatenate(calls, axis=0)
    stats = SpectStats.compute(jnp.asarray(spects))
    imgs = np.asarray(stats.spect_to_img(jnp.asarray(spects)))[..., None]
    return imgs.astype(np.float32), calls.astype(np.float32), stats


def save_whale_bigan(path: str, state, stats: SpectStats, meta=None):
    tree = {
        "params_E": state.params_E, "params_G": state.params_G,
        "vars_D": state.vars_D, "opt_eg": state.opt_eg, "opt_d": state.opt_d,
        "step": state.step,
        "spect_mean": np.asarray(stats.mean), "spect_std": np.asarray(stats.std),
    }
    # per-step noise stream; needed for bit-faithful resume (absent on
    # adapter objects, e.g. the finetune scripts' converted trees)
    rng = getattr(state, "rng", None)
    if rng is not None:
        tree["rng"] = rng
    save_checkpoint(
        path, tree,
        meta={"kind": "bigan-whale", "carries_rng": rng is not None,
              **(meta or {})},
    )


def load_whale_bigan(path: str):
    tree, meta = load_checkpoint(path)
    stats = SpectStats(jnp.asarray(tree["spect_mean"]), jnp.asarray(tree["spect_std"]))
    return tree, stats, meta
