"""Headline benchmarks (BASELINE.json): MNIST + AudioMNIST BiGAN training
steps/sec and batched counterfactual throughput on this chip.

Prints ONE JSON line. Primary metric: MNIST BiGAN train steps/sec (batch
64, d_updates_per_g_update=1 — the reference train loop's defaults,
image_scms/mnist.py:157-167), measured over whole scanned epochs.
``vs_baseline`` is the ratio to the PyTorch reference's own train loop on
this host's CPU (the reference publishes no numbers — BASELINE.md — so the
baseline is measured in-process with the reference module, shimmed only
for its unused pytorch_msssim import). Extra fields report the AudioMNIST
BiGAN (128^2, d=64) steps/sec and abduct-act-predict CF images/sec.

Set BENCH_SKIP_TORCH=1 to reuse the cached torch baseline;
BENCH_FAST=1 skips the audio model (for quick smoke runs).
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


def _mnist_data(n):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32)
    attrs = {
        "digit": np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)],
        "thickness": rng.uniform(-1, 1, n).astype(np.float32),
        "intensity": rng.uniform(-1, 1, n).astype(np.float32),
        "slant": rng.uniform(-1, 1, n).astype(np.float32),
    }
    return x, attrs


def measure_mnist_train() -> float:
    import jax

    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    x, attrs = _mnist_data(N_DATA)
    trainer = GANTrainer(
        BiGAN(mnist_bigan_config()),
        GANTrainConfig(batch_size=BATCH, d_updates_per_g_update=1),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(1)
    for w in range(2):  # compile + steady warmup
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, w))
        jax.block_until_ready(m)
    steps = 0
    t0 = time.perf_counter()
    for e in range(20):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 2 + e))
        steps += N_DATA // BATCH
    jax.block_until_ready(m)
    return steps / (time.perf_counter() - t0)


def measure_audio_train() -> float:
    """AudioMNIST BiGAN at full width (d=64), batch 128 (reference default,
    image_scms/audio_mnist.py:321-327)."""
    import jax

    from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    n, b = 1024, 128
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, 128, 128, 1)).astype(np.float32)
    attrs = {
        k: np.eye(card, dtype=np.float32)[rng.integers(0, card, n)]
        for k, card in CARDINALITIES.items()
    }
    trainer = GANTrainer(
        BiGAN(audio_mnist_bigan_config(d=64)),
        GANTrainConfig(batch_size=b, betas=(0.5, 0.9)),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(1)
    for w in range(2):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, w))
        jax.block_until_ready(m)
    steps = 0
    t0 = time.perf_counter()
    for e in range(8):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 2 + e))
        steps += n // b
    jax.block_until_ready(m)
    return steps / (time.perf_counter() - t0)


def measure_cf_throughput() -> float:
    """Batched abduct-act-predict images/sec on the full MNIST BiGAN: the
    whole attribute-CF + E + G chain as one jitted program
    (mnist_gan_counterfactuals.py:62-93)."""
    import jax
    import jax.numpy as jnp

    from imagecfgen_tpu.cf.engine import CounterfactualEngine
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.scm.mnist import MNISTAttributeSCM

    b = 2048
    x, attrs = _mnist_data(b)
    rng = np.random.default_rng(0)
    t = rng.gamma(10, 1 / 5, b).astype(np.float32) + 0.5
    i = (191 / (1 + np.exp(-(2 * t - 5))) + 64).astype(np.float32)
    s = (np.pi * rng.normal(0, 0.1, b)).astype(np.float32)
    raw_attrs = {"digit": attrs["digit"], "thickness": t, "intensity": i, "slant": s}
    scaler = AttributeScaler.fit(MNIST_SPEC, raw_attrs)
    scm = MNISTAttributeSCM.fit(
        {"thickness": t, "intensity": i, "slant": s, "digit": attrs["digit"].argmax(1)},
        steps=5, batch_size=b,
    )

    model = BiGAN(mnist_bigan_config())
    key = jax.random.PRNGKey(0)
    vE = jax.jit(lambda: model.encoder.init(
        {"params": key}, jnp.zeros((2, 28, 28, 1)),
        {k: jnp.asarray(v[:2]) for k, v in raw_attrs.items()}))()
    vG = jax.jit(lambda: model.generator.init(
        {"params": key}, jnp.zeros((2, 1, 1, 512)),
        {k: jnp.asarray(v[:2]) for k, v in raw_attrs.items()}))()
    engine = CounterfactualEngine(model, vE["params"], vG["params"], scm, scaler)

    xb = jax.device_put(x)
    ab = {k: jax.device_put(v) for k, v in raw_attrs.items()}
    iv = {"thickness": jax.device_put((t + 2).reshape(-1, 1))}
    out, _ = engine.counterfactual(key, xb, ab, iv)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 20
    for r in range(reps):
        out, _ = engine.counterfactual(jax.random.fold_in(key, r), xb, ab, iv)
    jax.block_until_ready(out)
    return b * reps / (time.perf_counter() - t0)


def measure_torch_baseline() -> float:
    """Run the reference's own train loop (CPU torch) on the same data
    shapes for a few batches. Returns steps/sec."""
    if os.environ.get("BENCH_SKIP_TORCH") and os.path.exists(CACHE):
        return json.load(open(CACHE))["torch_steps_per_sec"]
    try:
        import contextlib
        import types

        import torch

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
            "digit": torch.from_numpy(np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]),
            "thickness": torch.from_numpy(rng.uniform(1, 5, (n, 1)).astype(np.float32)),
            "intensity": torch.from_numpy(rng.uniform(64, 255, (n, 1)).astype(np.float32)),
            "slant": torch.from_numpy(rng.uniform(-1, 1, (n, 1)).astype(np.float32)),
        }
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


def _safe(fn, label):
    try:
        return fn()
    except Exception as e:
        print(f"{label} failed: {e!r}", file=sys.stderr)
        return None


LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last.json")


def _watchdog(seconds: int):
    """The axon TPU tunnel can wedge after abnormal client exits; if a
    phase stalls, emit the last successful record (marked stale) so the
    harness still gets its JSON line, then hard-exit."""
    import signal

    def fire(signum, frame):
        if os.path.exists(LAST_GOOD):
            rec = json.load(open(LAST_GOOD))
            rec["stale"] = True
            print(json.dumps(rec))
        else:
            print(json.dumps({
                "metric": "mnist_bigan_train_steps_per_sec",
                "value": 0.0, "unit": "steps/sec", "vs_baseline": None,
                "error": "tpu backend unresponsive (tunnel wedge)",
            }))
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def main():
    _watchdog(int(os.environ.get("BENCH_WATCHDOG_SECS", "900")))
    ours = measure_mnist_train()  # primary metric: let failures surface
    cf_ips = _safe(measure_cf_throughput, "cf throughput")
    audio = None if os.environ.get("BENCH_FAST") else _safe(
        measure_audio_train, "audio train"
    )
    base = measure_torch_baseline()
    ratio = ours / base if base == base else None
    record = {
        "metric": "mnist_bigan_train_steps_per_sec",
        "value": round(ours, 2),
        "unit": "steps/sec",
        "vs_baseline": round(ratio, 2) if ratio is not None else None,
        "baseline": "reference torch train loop, CPU, this host"
        + (f" ({base:.3f} steps/sec)" if base == base else " (unavailable)"),
        "batch_size": BATCH,
        "device": "tpu",
    }
    if cf_ips is not None:
        record["cf_images_per_sec"] = round(cf_ips, 1)
    if audio is not None:
        record["audio_bigan_steps_per_sec"] = round(audio, 2)
    json.dump(record, open(LAST_GOOD, "w"))
    print(json.dumps(record))
    sys.stdout.flush()
    os._exit(0)  # skip interpreter teardown (axon tunnel can hang there)


if __name__ == "__main__":
    main()
