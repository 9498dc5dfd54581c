"""At-scale training benchmark for the large-resolution families
(VERDICT r2 item 1): whale 256² BiGAN/VAE and ESRF 512² BiGAN at the
reference's real widths/batch sizes (`/root/reference` whalecalls.py:390-399
batch 32, esrf_acoustic.py:263-272 batch 64, both Adam(1e-4, 0.5, 0.9)),
on synthetic spectrograms, with remat on/off and f32/bf16 A/B.

For each case it records, as one JSON line appended to ``--out``:
  steps/sec (hard-sync barrier, bench.py protocol), FLOP/step and MFU
  (XLA cost analysis), the compiler's memory analysis (argument/output/
  temp/peak bytes), live device memory_stats when the plugin exposes
  them, and OOM outcomes (RESOURCE_EXHAUSTED is caught and recorded,
  not fatal) — proving whether the 512² config fits at batch 64 and
  whether remat makes it fit (SURVEY §7 hard part 6).

One process runs all cases sequentially (single-tenant axon tunnel —
never run two TPU clients). Usage:
    python tools/large_bench.py --cases whale:f32:0 whale:bf16:0 \
        esrf:f32:0 esrf:bf16:1 --out /tmp/large_bench.jsonl
Case syntax: family:dtype:remat[:batch] with family in
{whale, esrf, whale_vae}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import PEAK_FLOPS, _chip_gen  # single source for chip peaks

FAMILIES = {
    # family -> (image_size, reference batch, betas)
    "whale": (256, 32, (0.5, 0.9)),
    "esrf": (512, 64, (0.5, 0.9)),
    "whale_vae": (256, 32, None),
}


def synth_data(family: str, n: int):
    """Synthetic spectrogram-shaped data in [-1, 1] + per-family attrs."""
    rng = np.random.default_rng(0)
    size = FAMILIES[family][0]
    x = rng.uniform(-1, 1, (n, size, size, 1)).astype(np.float32)
    if family.startswith("whale"):
        attrs = {"call_type": np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)]}
    else:
        attrs = {
            "has_boat": np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)],
            "closest_boat": rng.uniform(-1, 1, n).astype(np.float32),
        }
    return x, attrs


def _mem_analysis(compiled):
    try:
        ma = compiled.memory_analysis()
        return {
            "argument_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "output_mb": round(ma.output_size_in_bytes / 1e6, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
            "peak_mb": round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 1e6, 1),
        }
    except Exception as e:
        return {"error": repr(e)}


def _live_mem():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return None
        out = {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                out[k.replace("bytes", "mb")] = round(stats[k] / 1e6, 1)
        return out or dict(stats)
    except Exception:
        return None


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return float("nan")


def run_case(family: str, dtype: str, remat: bool, batch: int | None,
             epochs: int, n_data: int):
    import jax
    import jax.numpy as jnp

    from imagecfgen_tpu.utils.profiling import sync

    size, ref_batch, betas = FAMILIES[family]
    batch = batch or ref_batch
    cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    rec = {
        "family": family, "dtype": dtype, "remat": bool(remat),
        "batch": batch, "image_size": size,
    }
    x, attrs = synth_data(family, n_data)
    t0 = time.time()
    try:
        if family == "whale_vae":
            from imagecfgen_tpu.models.vae import ConditionalVAE, whale_vae_config
            from imagecfgen_tpu.train.vae_trainer import VAETrainConfig, VAETrainer

            trainer = VAETrainer(
                ConditionalVAE(whale_vae_config(compute_dtype=cdt)),
                VAETrainConfig(batch_size=batch),
            )
            state = trainer.init_state(jax.random.PRNGKey(0))
            step_fn = trainer.train_step
        else:
            from imagecfgen_tpu.models.bigan import (
                BiGAN, esrf_bigan_config, whale_bigan_config)
            from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

            cfg_fn = whale_bigan_config if family == "whale" else esrf_bigan_config
            trainer = GANTrainer(
                BiGAN(cfg_fn(compute_dtype=cdt)),
                GANTrainConfig(batch_size=batch, betas=betas,
                               d_updates_per_g_update=1, remat=remat),
            )
            state = trainer.init_state(jax.random.PRNGKey(0))
            step_fn = trainer.train_step

        b = {"image": jnp.asarray(x[:batch]),
             "attrs": {k: jnp.asarray(v[:batch]) for k, v in attrs.items()}}
        lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(state, b)
        compiled = lowered.compile()
        flops = _cost(compiled)
        rec["gflops_per_step"] = round(flops / 1e9, 1) if flops == flops else None
        rec["memory_analysis"] = _mem_analysis(compiled)
        rec["compile_s"] = round(time.time() - t0, 1)

        # run the real epoch program (scan over device-resident batches)
        nb = n_data // batch
        perm = np.arange(nb * batch)

        def stack(v):
            return jnp.asarray(v[perm].reshape((nb, batch) + v.shape[1:]))

        batches = {"image": stack(x),
                   "attrs": {k: stack(v) for k, v in attrs.items()}}
        state, m = trainer.run_epoch(state, batches)  # compile + warmup
        sync(m)
        t1 = time.perf_counter()
        for e in range(epochs):
            state, m = trainer.run_epoch(state, batches)
        metrics = sync(m)
        dt = time.perf_counter() - t1
        leaf = jax.tree_util.tree_leaves(metrics)[0]
        assert np.isfinite(leaf), metrics
        sps = nb * epochs / dt
        rec["steps_per_sec"] = round(sps, 3)
        rec["step_time_ms"] = round(1e3 / sps, 1)
        gen = _chip_gen()
        if flops == flops:
            rec["mfu_pct"] = round(100 * sps * flops / PEAK_FLOPS.get(gen, 197e12), 1)
        rec["live_memory"] = _live_mem()
        rec["ok"] = True
    except Exception as e:
        msg = repr(e)
        rec["ok"] = False
        rec["oom"] = "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
        rec["error"] = msg[:2000]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="+", required=True,
                    help="family:dtype:remat[:batch], e.g. esrf:bf16:1")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n-data", type=int, default=0,
                    help="synthetic samples (0 = 4 batches)")
    ap.add_argument("--out", default="/tmp/large_bench.jsonl")
    args = ap.parse_args()
    for case in args.cases:
        parts = case.split(":")
        family, dtype, remat = parts[0], parts[1], bool(int(parts[2]))
        batch = int(parts[3]) if len(parts) > 3 else None
        n = args.n_data or 4 * (batch or FAMILIES[family][1])
        print(f"=== {case} (n_data={n}) ===", flush=True)
        rec = run_case(family, dtype, remat, batch, args.epochs, n)
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")
    os._exit(0)  # clean exit; interpreter teardown can hang the axon tunnel


if __name__ == "__main__":
    main()
