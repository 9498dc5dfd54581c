"""Honest TPU perf probe for the MNIST BiGAN train step.

Measures steps/sec with a hard device->host sync barrier
(utils.profiling.sync — block_until_ready is unreliable on axon), for
f32 vs bf16 compute, and reports XLA cost-analysis FLOPs + MFU.

Usage: python tools/perf_probe.py [--batch 64] [--epochs 20] [--fast]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e bf16 peak (PALLAS_AXON_TPU_GEN=v5e); conservative denominator for MFU.
PEAK_FLOPS = {"v5e": 197e12, "v4": 275e12, "v5p": 459e12}


def chip_peak() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return PEAK_FLOPS.get(gen, 197e12)


def make_trainer(batch, dtype, n_data=4096):
    import jax
    import jax.numpy as jnp

    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n_data, 28, 28, 1)).astype(np.float32)
    attrs = {
        "digit": np.eye(10, dtype=np.float32)[rng.integers(0, 10, n_data)],
        "thickness": rng.uniform(-1, 1, n_data).astype(np.float32),
        "intensity": rng.uniform(-1, 1, n_data).astype(np.float32),
        "slant": rng.uniform(-1, 1, n_data).astype(np.float32),
    }
    dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    trainer = GANTrainer(
        BiGAN(mnist_bigan_config(compute_dtype=dt)),
        GANTrainConfig(batch_size=batch, d_updates_per_g_update=1),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    return trainer, state, data, n_data


def step_flops(trainer, state, data, batch) -> float:
    """XLA cost-analysis FLOPs of ONE train step."""
    import jax

    b = {
        "image": data["image"][:batch],
        "attrs": {k: v[:batch] for k, v in data["attrs"].items()},
    }
    try:
        comp = jax.jit(trainer.train_step).lower(state, b).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception as e:
        print(f"cost_analysis failed: {e!r}", file=sys.stderr)
        return float("nan")


def measure(trainer, state, data, n_data, batch, epochs, mode):
    """steps/sec; mode 'chain' syncs once after all epochs, 'epoch' per epoch."""
    import jax

    from imagecfgen_tpu.utils.profiling import sync

    key = jax.random.PRNGKey(1)
    for w in range(2):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, w))
        sync(m)
    steps = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 2 + e))
        steps += n_data // batch
        if mode == "epoch":
            sync(m)
    loss = sync(m)
    dt = time.perf_counter() - t0
    assert loss is not None and np.isfinite(loss), loss
    return steps / dt, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--modes", default="chain,epoch")
    args = ap.parse_args()

    peak = chip_peak()
    out = {"batch": args.batch, "peak_flops": peak}
    for dtype in args.dtypes.split(","):
        trainer, state, data, n_data = make_trainer(args.batch, dtype)
        fl = step_flops(trainer, state, data, args.batch)
        out[f"{dtype}_gflops_per_step"] = round(fl / 1e9, 2)
        for mode in args.modes.split(","):
            sps, state = measure(
                trainer, state, data, n_data, args.batch, args.epochs, mode
            )
            out[f"{dtype}_{mode}_steps_per_sec"] = round(sps, 1)
            out[f"{dtype}_{mode}_mfu_pct"] = round(100 * sps * fl / peak, 1)
        del trainer, state, data
    print(json.dumps(out, indent=2))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
