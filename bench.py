"""Headline benchmark: MNIST BiGAN train steps/sec (full 512-latent model).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": R, ...}

- value: steady-state alternating-GAN steps/sec on this chip (batch 64,
  d_updates_per_g_update=1 — the reference train loop's defaults,
  image_scms/mnist.py:157-167), measured over whole scanned epochs.
- vs_baseline: ratio to the PyTorch reference's train loop executing the
  same schedule on this host's CPU (the reference has no published
  numbers — BASELINE.md — so the baseline is measured in-process with the
  reference's own module, shimmed only for its unused pytorch_msssim
  import). Set BENCH_SKIP_TORCH=1 to skip the baseline re-measure and use
  the cached value.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = 64
N_DATA = 4096
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")


def measure_ours() -> float:
    import jax

    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (N_DATA, 28, 28, 1)).astype(np.float32)
    attrs = {
        "digit": np.eye(10, dtype=np.float32)[rng.integers(0, 10, N_DATA)],
        "thickness": rng.uniform(-1, 1, N_DATA).astype(np.float32),
        "intensity": rng.uniform(-1, 1, N_DATA).astype(np.float32),
        "slant": rng.uniform(-1, 1, N_DATA).astype(np.float32),
    }
    trainer = GANTrainer(
        BiGAN(mnist_bigan_config()),
        GANTrainConfig(batch_size=BATCH, d_updates_per_g_update=1),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(1)

    # warmup: compile + one steady epoch
    state, m = trainer.fit_epoch(state, data, key)
    jax.block_until_ready(m)
    state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 1))
    jax.block_until_ready(m)

    steps = 0
    t0 = time.perf_counter()
    n_epochs = 20
    for e in range(n_epochs):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 2 + e))
        steps += N_DATA // BATCH
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return steps / dt


def measure_torch_baseline() -> float:
    """Run the reference's own train loop (CPU torch) on the same data
    shapes for a few batches. Returns steps/sec."""
    if os.environ.get("BENCH_SKIP_TORCH") and os.path.exists(CACHE):
        return json.load(open(CACHE))["torch_steps_per_sec"]
    try:
        import types

        import torch

        # the reference's training_utils imports pytorch_msssim (unused by
        # the BiGAN train loop); shim it so the module imports
        if "pytorch_msssim" not in sys.modules:
            shim = types.ModuleType("pytorch_msssim")
            shim.ssim = lambda *a, **k: torch.tensor(0.0)
            sys.modules["pytorch_msssim"] = shim
        sys.path.insert(0, "/root/reference")
        from image_scms import mnist as ref_mnist

        torch.manual_seed(0)
        rng = np.random.default_rng(0)
        n = BATCH * 6
        x = torch.from_numpy(rng.uniform(0, 255, (n, 28, 28)).astype(np.float32))
        a = {
            "digit": torch.from_numpy(
                np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]
            ),
            "thickness": torch.from_numpy(rng.uniform(1, 5, (n, 1)).astype(np.float32)),
            "intensity": torch.from_numpy(rng.uniform(64, 255, (n, 1)).astype(np.float32)),
            "slant": torch.from_numpy(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
        }
        import contextlib

        t0 = time.perf_counter()
        with contextlib.redirect_stdout(sys.stderr):  # keep stdout = 1 JSON line
            ref_mnist.train(
                x, a, x_test=x[:10], a_test={k: v[:10] for k, v in a.items()},
                n_epochs=1, batch_size=BATCH, save_images_every=None, device="cpu",
            )
        dt = time.perf_counter() - t0
        sps = (n // BATCH) / dt
        json.dump({"torch_steps_per_sec": sps}, open(CACHE, "w"))
        return sps
    except Exception as e:
        print(f"baseline measurement failed: {e!r}", file=sys.stderr)
        if os.path.exists(CACHE):
            return json.load(open(CACHE))["torch_steps_per_sec"]
        return float("nan")


def main():
    ours = measure_ours()
    base = measure_torch_baseline()
    ratio = ours / base if base == base else None  # NaN check
    print(
        json.dumps(
            {
                "metric": "mnist_bigan_train_steps_per_sec",
                "value": round(ours, 2),
                "unit": "steps/sec",
                "vs_baseline": round(ratio, 2) if ratio is not None else None,
                "baseline": "reference torch train loop, CPU, this host"
                + (f" ({base:.3f} steps/sec)" if base == base else " (unavailable)"),
                "batch_size": BATCH,
                "device": "tpu",
            }
        )
    )


if __name__ == "__main__":
    main()
