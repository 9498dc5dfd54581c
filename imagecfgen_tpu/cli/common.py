"""Shared CLI plumbing: artifact formats and data loading.

Artifact names stay drop-in compatible with the reference's hardcoded CWD
paths (``mnist-bigan.tar``, ``mnist-attribute-scm.tar``, ``mnist-vae.tar``,
``mnist_clf.tar`` — ``mnist_gan_counterfactuals.py:19-33`` etc.); payloads
are this framework's msgpack pytree checkpoints (core/checkpoint.py).
"""
from __future__ import annotations

import os
from typing import Dict, Mapping, Optional, Tuple

import jax
import numpy as np

from ..core.attributes import AttributeScaler, MNIST_SPEC
from ..core.checkpoint import load_checkpoint, save_checkpoint
from ..data.mnist import load_mnist_arrays
from ..scm.mnist import MNISTAttributeSCM

def _cli_excepthook(exc_type, exc, tb):
    """Uncaught CLI exceptions print normally, then hard-exit: a crashed
    TPU client that lingers in interpreter teardown wedges the axon tunnel
    for the *next* client (observed repeatedly)."""
    import sys
    import traceback

    traceback.print_exception(exc_type, exc, tb)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(1)


def install_cli_excepthook() -> None:
    """Install the hard-exit excepthook. Called explicitly by CLI entry
    points only — installing it as an import side effect would silently
    disable normal exception teardown (atexit handlers, tempfile cleanup,
    pytest reporting) for library importers like the checkpoint converter
    and the test suite.

    Also honors a non-default ``JAX_PLATFORMS`` env override: the axon TPU
    plugin ignores the env var, so CPU-pinned subprocess runs (the slow
    battery tests) would otherwise grab the single-tenant TPU."""
    import sys

    sys.excepthook = _cli_excepthook
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and plat != "axon":
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def clean_exit(code: int = 0) -> None:
    """Close the device backend, flush, and exit without interpreter
    teardown.

    The axon TPU tunnel's client teardown can deadlock at interpreter exit
    (observed: scripts finish all work, save checkpoints, then hang in
    atexit; a killed client then wedges the server for minutes). Closing
    the PJRT backend explicitly releases the single-tenant device slot so
    the *next* CLI invocation connects immediately; a watchdog thread hard
    exits anyway if that close itself wedges.
    """
    import sys
    import threading

    timer = threading.Timer(15.0, lambda: os._exit(code))
    timer.daemon = True
    timer.start()
    try:
        import jax

        try:
            jax.clear_backends()
        except Exception:
            from jax.extend import backend as _xb

            _xb.clear_backends()
    except Exception:
        pass
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


# ------------------------------------------------------------------ data


def load_mnist_training_data(data_dir: str, split: str = "train"):
    """Returns (x_scaled (N,28,28,1) in [-1,1], attrs raw dict, scaler).

    Images scale [0,255] -> [-1,1] (``image_scms/mnist.py:204``); the
    scaler carries the train-set min/max for continuous attributes.
    """
    x, attrs = load_mnist_arrays(data_dir, split)
    x = (2.0 * x.reshape((-1, 28, 28, 1)) / 255.0 - 1.0).astype(np.float32)
    scaler = AttributeScaler.fit(MNIST_SPEC, attrs)
    return x, attrs, scaler


def scale_attrs_np(scaler: AttributeScaler, attrs: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    import jax.numpy as jnp

    scaled = scaler.scale({k: jnp.asarray(v) for k, v in attrs.items()})
    return {k: np.asarray(v) for k, v in scaled.items()}


def artifact_path(override, model_dir, default_name):
    """Resolve a model artifact: the reference's per-file flags (e.g.
    ``--image-model``) override the ``--model-dir`` layout when given."""
    return override if override else os.path.join(model_dir or ".", default_name)


# ------------------------------------------------------------------ BiGAN


def save_bigan(path: str, state, scaler: AttributeScaler, meta: Optional[Dict] = None):
    tree = {
        "params_E": state.params_E,
        "params_G": state.params_G,
        "vars_D": state.vars_D,
        "opt_eg": state.opt_eg,
        "opt_d": state.opt_d,
        "step": state.step,
        "scaler": scaler.state_dict(),
    }
    # per-step noise stream; needed for bit-faithful resume (absent on
    # adapter objects, e.g. the finetune scripts' converted trees)
    rng = getattr(state, "rng", None)
    if rng is not None:
        tree["rng"] = rng
    save_checkpoint(
        path, tree,
        meta={"kind": "bigan", "carries_rng": rng is not None, **(meta or {})},
    )


def load_bigan(path: str):
    """Returns (tree dict, scaler)."""
    import warnings

    tree, meta = load_checkpoint(path)
    scaler = AttributeScaler.from_state_dict(MNIST_SPEC, tree["scaler"])
    if meta.get("scaler_valid") is False:
        warnings.warn(
            f"{path} was converted without training data: its attribute "
            "scaler is an identity placeholder and downstream counterfactuals "
            "will consume unscaled attributes. Re-convert with --data-dir.",
            stacklevel=2,
        )
    return tree, scaler, meta


# ------------------------------------------------------------------ SCM


def save_attribute_scm(path: str, scm: MNISTAttributeSCM):
    save_checkpoint(path, scm.state_dict(), meta={"kind": "attribute-scm-mnist"})


def load_attribute_scm(path: str) -> MNISTAttributeSCM:
    tree, _ = load_checkpoint(path)  # load_checkpoint restores tuple structure
    tree = dict(tree)
    tree["bounds"] = {
        k: tuple(float(b) for b in v) for k, v in tree["bounds"].items()
    }
    return MNISTAttributeSCM.from_state_dict(tree)


# ------------------------------------------------------------------ misc


def save_grid_png(path: str, rows, row_labels, title: str = "", vmin=-1, vmax=1):
    """Save a rows x n image grid (reference's per-epoch sample grids,
    ``image_scms/mnist.py:278-297``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_rows = len(rows)
    n = len(rows[0])
    fig, ax = plt.subplots(n_rows, n, figsize=(1.5 * n, 1.6 * n_rows), squeeze=False)
    fig.subplots_adjust(wspace=0.05, hspace=0)
    if title:
        fig.suptitle(title)
    for r, (imgs, label) in enumerate(zip(rows, row_labels)):
        for i in range(n):
            ax[r, i].imshow(np.asarray(imgs[i]).squeeze(), cmap="gray", vmin=vmin, vmax=vmax)
            ax[r, i].axis("off")
        ax[r, 0].set_ylabel(label)
        fig.text(0.02, 1 - (r + 0.5) / n_rows, label, ha="left", va="center")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close(fig)
