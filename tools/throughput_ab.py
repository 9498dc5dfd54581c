"""A/B the GANTrainConfig throughput options on the real TPU (VERDICT r2
item 5: capture part of the characterized ~2.5x MNIST headroom).

Measures MNIST BiGAN steps/sec (bench.py protocol: whole scanned epochs,
hard device->host sync) across option stacks at the throughput config
(bf16, batch 1024 — where docs/PERF.md says 36% MFU) and at the parity
config (f32, batch 64). Appends one JSON line per case to --out.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(case: dict, batch: int, dtype: str, n_data: int, epochs: int):
    import jax
    import jax.numpy as jnp

    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
    from imagecfgen_tpu.utils.profiling import sync

    cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    mu = jnp.bfloat16 if case.get("mu_bf16") else None
    trainer = GANTrainer(
        BiGAN(mnist_bigan_config(compute_dtype=cdt)),
        GANTrainConfig(
            batch_size=batch,
            flat_adam=case.get("flat", False),
            fused_d_steps=case.get("fused_d", False),
            fused_eg_d=case.get("fused_eg_d", False),
            mu_dtype=mu,
        ),
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n_data, 28, 28, 1)).astype(np.float32)
    attrs = {
        "digit": np.eye(10, dtype=np.float32)[rng.integers(0, 10, n_data)],
        "thickness": rng.uniform(-1, 1, n_data).astype(np.float32),
        "intensity": rng.uniform(-1, 1, n_data).astype(np.float32),
        "slant": rng.uniform(-1, 1, n_data).astype(np.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(1)
    for w in range(2):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, w))
        sync(m)
    t0 = time.perf_counter()
    for e in range(epochs):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 2 + e))
    loss = sync(m)
    dt = time.perf_counter() - t0
    assert np.isfinite(jax.tree_util.tree_leaves(loss)[0])
    return (n_data // batch) * epochs / dt


CASES = [
    ("baseline", {}),
    ("flat_adam", {"flat": True}),
    ("flat+fused_d", {"flat": True, "fused_d": True}),
    ("flat+fused_d+mu_bf16", {"flat": True, "fused_d": True, "mu_bf16": True}),
]

# round-2 sweep: flat_adam LOST everywhere (the grad ravel adds a full
# read+write of all grads — more traffic than the per-leaf kernels cost);
# the second sweep drops it and adds the batched-D options
CASES2 = [
    ("baseline", {}),
    ("fused_d", {"fused_d": True}),
    ("fused_eg_d", {"fused_eg_d": True}),
    ("fused_both", {"fused_d": True, "fused_eg_d": True}),
    ("fused_both+mu_bf16", {"fused_d": True, "fused_eg_d": True, "mu_bf16": True}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/throughput_ab.jsonl")
    ap.add_argument("--configs", nargs="+",
                    default=["bf16:1024:8192:20", "f32:64:4096:20"],
                    help="dtype:batch:n_data:epochs")
    ap.add_argument("--sweep", type=int, default=1, choices=(1, 2))
    args = ap.parse_args()
    for cfg in args.configs:
        dtype, batch, n_data, epochs = cfg.split(":")
        for name, case in (CASES if args.sweep == 1 else CASES2):
            t0 = time.time()
            sps = measure(case, int(batch), dtype, int(n_data), int(epochs))
            rec = {"config": cfg, "case": name, "steps_per_sec": round(sps, 2),
                   "wall_s": round(time.time() - t0, 1)}
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")
    os._exit(0)


if __name__ == "__main__":
    main()
