"""Data-parallel scaling measurement on a virtual CPU mesh.

Measures MNIST BiGAN train throughput at 1/2/4/8 mesh devices with a
FIXED global batch (so per-device work shrinks and the gradient
all-reduce cost is exposed) and with a fixed per-device batch (weak
scaling). Virtual CPU devices share the host's cores, so absolute
steps/sec is meaningless — the point is that the sharded program
compiles, executes, and the loss trajectory is device-count-invariant
(tests/test_trainers.py pins 1-vs-8 equality); the table records the
observed scaling shape for RESULTS.md.

Usage: python tools/dp_scaling.py [--global-batch 256] [--epochs 3]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# virtual 8-device CPU mesh must be configured before jax initializes
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config  # noqa: E402
from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer  # noqa: E402
from imagecfgen_tpu.utils.profiling import sync  # noqa: E402


def narrowed_config():
    """Flagship topology at reduced width so CPU epochs finish quickly."""
    cfg = mnist_bigan_config(latent_dim=64)
    lr, lrd = ("lrelu", 0.2), ("lrelu", 0.1)
    return dataclasses.replace(
        cfg,
        embed_dim=16,
        embed_hw=(4, 4),
        enc_plan=(("conv", 16, 3, 2, 1), lr, ("conv", 32, 4, 2, 1), lr,
                  ("conv", 64, 4, 2, 1), lr, ("conv", 64, 4, 2, 1), lr,
                  ("conv", 64, 1, 2, 0)),
        gen_plan=(("convT", 64, 3, 1, 0), lr, ("convT", 64, 3, 2, 0), lr,
                  ("convT", 32, 3, 2, 1), lr, ("convT", 16, 3, 2, 1), lr,
                  ("convT", 1, 4, 1, 0), ("tanh",)),
        dx_plan=(("drop2d", 0.2), ("conv", 16, 5, 1, 0), lrd, ("bn",),
                 ("conv", 32, 4, 2, 0), lrd, ("bn",),
                 ("conv", 64, 4, 2, 0), lrd, ("conv", 64, 4, 1, 0), lrd),
        dz_plan=(("conv", 64, 1, 1, 0), lrd),
        dxz_plan=(("conv", 64, 1, 1, 0), lrd, ("conv", 1, 1, 1, 0)),
    )


def _data(n):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32)
    attrs = {
        "digit": np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)],
        "thickness": rng.uniform(-1, 1, n).astype(np.float32),
        "intensity": rng.uniform(-1, 1, n).astype(np.float32),
        "slant": rng.uniform(-1, 1, n).astype(np.float32),
    }
    return x, attrs


def measure(n_dev: int, batch: int, n_data: int, epochs: int) -> float:
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    trainer = GANTrainer(BiGAN(narrowed_config()),
                         GANTrainConfig(batch_size=batch), mesh=mesh)
    x, attrs = _data(n_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(1)
    state, m = trainer.fit_epoch(state, data, key)  # compile
    sync(m)
    steps = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, e))
        steps += n_data // batch
    loss = sync(m)
    assert loss is not None and np.isfinite(loss)
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--global-batch", type=int, default=256)
    ap.add_argument("--per-device-batch", type=int, default=64)
    ap.add_argument("--n-data", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    out = {"host_devices": len(jax.devices()),
           "host_cores": os.cpu_count(),
           "note": "virtual CPU devices share host cores; shape, not speed"}
    # emit each row as it lands so a cut-short run still yields data
    for n in (1, 2, 4, 8):
        sps = measure(n, args.global_batch, args.n_data, args.epochs)
        key = f"strong_b{args.global_batch}_n{n}_steps_per_sec"
        out[key] = round(sps, 2)
        print(f"[row] {key} = {out[key]}", flush=True)
    for n in (1, 2, 4, 8):
        sps = measure(n, args.per_device_batch * n, args.n_data, args.epochs)
        key = f"weak_b{args.per_device_batch}x{n}"
        out[f"{key}_steps_per_sec"] = round(sps, 2)
        out[f"{key}_img_per_sec"] = round(sps * args.per_device_batch * n, 1)
        print(f"[row] {key} = {out[f'{key}_steps_per_sec']} steps/s", flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
