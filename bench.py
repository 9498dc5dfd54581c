"""Headline benchmarks (BASELINE.json): MNIST + AudioMNIST BiGAN training
steps/sec and batched counterfactual throughput on this chip.

Prints ONE JSON line. Primary metric: MNIST BiGAN train steps/sec (batch
64, d_updates_per_g_update=1 — the reference train loop's defaults,
image_scms/mnist.py:157-167), measured over whole scanned epochs with a
HARD device->host sync barrier (utils.profiling.sync) closing the timed
region. ``jax.block_until_ready`` is never used for timing: on the axon
platform it synchronizes dispatch, not execution, and inflates rates
~100x (round 1's 49k steps/sec was exactly this artifact; the honest
rate is in the hundreds).

Alongside steps/sec the record reports the XLA cost-analysis FLOPs and
bytes of one train step, the implied MFU against the chip's bf16 peak,
and the HBM roofline fraction — at batch 64 this step is memory-bound
on optimizer/parameter traffic (~0.9 GB/step), so the roofline fraction
is the hardware-honest utilization number, not MFU (see docs/PERF.md).

``vs_baseline`` is the ratio to the PyTorch reference's own train loop
on this host's CPU (the reference publishes no numbers — BASELINE.md).
Extra fields: bf16 batch-256 throughput config, the fused f32 batch-64
throughput config (opt-in D-step/EG fusions + bf16 Adam moment),
AudioMNIST/whale/ESRF BiGAN steps/sec, and abduct-act-predict CF
images/sec.

Set BENCH_SKIP_TORCH=1 to reuse the cached torch baseline;
BENCH_FAST=1 skips everything but the primary MNIST metric and CF
throughput (no bf16 throughput config, no audio/whale/ESRF models).
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

# bf16 peak of the attached chip generation, for the MFU denominator.
PEAK_FLOPS = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}
HBM_GBPS = {"v4": 1228.0, "v5e": 819.0, "v5p": 2765.0, "v6e": 1640.0}


def _chip_gen() -> str:
    return os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")


def _sync(tree):
    from imagecfgen_tpu.utils.profiling import sync

    return sync(tree)


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


def _step_cost(trainer, state, data, batch):
    """(flops, bytes) of ONE jitted train step, from the XLA compiler."""
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
        return float(ca["flops"]), float(ca.get("bytes accessed", float("nan")))
    except Exception as e:  # cost analysis is best-effort
        print(f"cost_analysis failed: {e!r}", file=sys.stderr)
        return float("nan"), float("nan")


def _measure_bigan(config, batch, n_data, epochs, betas=(0.5, 0.999),
                   min_seconds=0.0, **tcfg_kw):
    """Build a BiGAN trainer on synthetic data and time `epochs` epochs,
    dispatched as a chain and closed with one hard sync. When
    ``min_seconds`` is set, the epoch count is calibrated from the warmup
    epoch's synced time so the timed region covers at least that long —
    short regions are dominated by tunnel dispatch jitter (VERDICT r3
    weak item 5). Returns (steps_per_sec, flops_per_step, bytes_per_step)."""
    import jax

    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
    from imagecfgen_tpu.models.bigan import BiGAN

    model, data_fn = config
    trainer = GANTrainer(
        BiGAN(model),
        GANTrainConfig(batch_size=batch, d_updates_per_g_update=1, betas=betas,
                       **tcfg_kw),
    )
    x, attrs = data_fn(n_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    flops, nbytes = _step_cost(trainer, state, data, batch)
    key = jax.random.PRNGKey(1)
    state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 0))
    _sync(m)  # compile
    t0 = time.perf_counter()
    state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 1))
    _sync(m)  # steady warmup, doubles as the calibration epoch
    epoch_s = time.perf_counter() - t0
    if min_seconds > 0:
        epochs = max(epochs, int(np.ceil(min_seconds / max(epoch_s, 1e-4))))
    steps = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key, 2 + e))
        steps += n_data // batch
    loss = _sync(m)  # hard barrier: device->host fetch of the final metrics
    dt = time.perf_counter() - t0
    assert loss is not None and np.isfinite(loss), loss
    return steps / dt, flops, nbytes


def measure_mnist_train():
    """Primary metric: reference-parity config (f32, batch 64)."""
    from imagecfgen_tpu.models.bigan import mnist_bigan_config

    return _measure_bigan((mnist_bigan_config(), _mnist_data), BATCH, N_DATA, 20,
                          min_seconds=5.0)


def measure_mnist_throughput():
    """Secondary throughput config: bf16 compute, batch 256."""
    import jax.numpy as jnp

    from imagecfgen_tpu.models.bigan import mnist_bigan_config

    return _measure_bigan(
        (mnist_bigan_config(compute_dtype=jnp.bfloat16), _mnist_data),
        256, N_DATA, 40, min_seconds=5.0,
    )


def measure_mnist_fused():
    """Captured-headroom config: f32 batch 64 with the opt-in step fusions
    (one D update on concat pairs + batched EG D-passes + bf16 Adam moment;
    docs/PERF.md "capturing the headroom" — +32% over parity in the round-3
    A/B). Semantics differ from the reference's two sequential D updates,
    so this is reported separately from the parity metric."""
    import jax.numpy as jnp

    from imagecfgen_tpu.models.bigan import mnist_bigan_config

    return _measure_bigan(
        (mnist_bigan_config(), _mnist_data), BATCH, N_DATA, 20,
        min_seconds=5.0,
        fused_d_steps=True, fused_eg_d=True, mu_dtype=jnp.bfloat16,
    )


def measure_audio_train():
    """AudioMNIST BiGAN at full width (d=64), batch 128 (reference default,
    image_scms/audio_mnist.py:321-327)."""
    from imagecfgen_tpu.models.bigan import audio_mnist_bigan_config
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES

    def data_fn(n):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (n, 128, 128, 1)).astype(np.float32)
        attrs = {
            k: np.eye(card, dtype=np.float32)[rng.integers(0, card, n)]
            for k, card in CARDINALITIES.items()
        }
        return x, attrs

    return _measure_bigan(
        (audio_mnist_bigan_config(d=64), data_fn), 128, 1024, 8,
        betas=(0.5, 0.9), min_seconds=8.0,
    )


def measure_whale_train():
    """Whale-call BiGAN 256^2 at full width (d=64), reference batch 32
    (whalecalls.py:390-399), f32. Protocol pinned to tools/large_bench.py's
    ``run_epoch`` over pre-stacked batches (no per-epoch on-device shuffle)
    so the two records are directly comparable — the r03 23.3-vs-25.1
    steps/s drift was exactly this protocol difference plus a too-short
    timed region (VERDICT r3 weak item 5)."""
    import jax
    import jax.numpy as jnp

    from imagecfgen_tpu.models.bigan import BiGAN, whale_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    batch, n_data = 32, 128
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n_data, 256, 256, 1)).astype(np.float32)
    attrs = {"call_type": np.eye(3, dtype=np.float32)[rng.integers(0, 3, n_data)]}
    trainer = GANTrainer(
        BiGAN(whale_bigan_config()),
        GANTrainConfig(batch_size=batch, d_updates_per_g_update=1, betas=(0.5, 0.9)),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    flops, nbytes = _step_cost(
        trainer, state, {"image": x, "attrs": attrs}, batch)
    nb = n_data // batch

    def stack(v):
        return jnp.asarray(v[: nb * batch].reshape((nb, batch) + v.shape[1:]))

    batches = {"image": stack(x), "attrs": {k: stack(v) for k, v in attrs.items()}}
    state, m = trainer.run_epoch(state, batches)
    _sync(m)  # compile
    t0 = time.perf_counter()
    state, m = trainer.run_epoch(state, batches)
    _sync(m)  # warmup doubles as calibration
    epoch_s = time.perf_counter() - t0
    epochs = max(6, int(np.ceil(8.0 / max(epoch_s, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(epochs):
        state, m = trainer.run_epoch(state, batches)
    loss = _sync(m)
    dt = time.perf_counter() - t0
    assert loss is not None and np.isfinite(loss), loss
    return nb * epochs / dt, flops, nbytes


def measure_esrf_train():
    """ESRF BiGAN 512^2 at full width, reference batch 64
    (esrf_acoustic.py:263-272), bf16 compute (f32 also fits — 15.5 GB
    peak vs 15.1; see docs/PERF.md large-model table)."""
    import jax.numpy as jnp

    from imagecfgen_tpu.models.bigan import esrf_bigan_config

    def data_fn(n):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (n, 512, 512, 1)).astype(np.float32)
        attrs = {
            "has_boat": np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)],
            "closest_boat": rng.uniform(-1, 1, n).astype(np.float32),
        }
        return x, attrs

    return _measure_bigan(
        (esrf_bigan_config(compute_dtype=jnp.bfloat16), data_fn),
        64, 128, 3, betas=(0.5, 0.9), min_seconds=10.0,
    )


def measure_cf_throughput(compute_dtype=None):
    """Batched abduct-act-predict images/sec on the full MNIST BiGAN: the
    whole attribute-CF + E + G chain as one jitted program
    (mnist_gan_counterfactuals.py:62-93). Returns (median img/s over 3
    pinned 480-rep regions after a warmup region, spread %) — see the
    protocol note below. ``compute_dtype`` switches the
    E/G forwards (params stay f32); bf16 is a pure-inference option the
    engine supports via the model config."""
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

    cfg = mnist_bigan_config()
    if compute_dtype is not None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, compute_dtype=compute_dtype)
    model = BiGAN(cfg)
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
    _sync(out)  # compile + parity check of the public single-call path

    # Protocol pinned in round 5 (VERDICT r4 item 4; probe rows in
    # docs/cf_region_probe_r05.jsonl, analysis in docs/PERF.md). The
    # per-call protocol of rounds 1-4 measured the axon tunnel, not the
    # device: each region paid a fixed C ~ 0.3-0.4 s (async-dispatch
    # drain + a 6.4 MB image-batch sync fetch), and between regions the
    # 480 individual dispatch RPCs made the rate hostage to host/tunnel
    # scheduling (3 consecutive runs spanned 245k-383k img/s). Both the
    # r03 number (74.4k, 20-rep regions ~85% C) and the r04 number
    # (122.1k, ~0.6 s regions - its 10-rep calibration included its own
    # C, so the chosen rep count was ~3x short) sit on the resulting
    # ramp rate(T) = R_inf*(1 - C/T).
    #
    # Pinned protocol - the same scanned-dispatch idiom every trainer
    # number in this file uses ("time whole scanned programs", verify
    # skill): INNER reps of the identical jitted CF chain are fused into
    # one dispatch via lax.scan (keys folded per rep; outputs reduced
    # into the carry so nothing is DCE'd), a region is CHAINS dispatches
    # = 480 reps, and the closing sync fetches one scalar. Per-dispatch
    # device time ~70 ms vs ~1-3 ms dispatch RPC keeps the pipeline full
    # even under host contention. One warmup region is discarded, then
    # median end-to-end rate of 3 regions + spread.
    INNER, CHAINS = 16, 30

    def one_rep(k):
        x_cf, _ = engine.counterfactual(k, xb, ab, iv)
        return jnp.sum(x_cf)

    @jax.jit
    def chain(key0):
        def body(acc, i):
            return acc + one_rep(jax.random.fold_in(key0, i)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(INNER))
        return acc

    def timed_region(salt):
        t0 = time.perf_counter()
        for r in range(CHAINS):
            acc = chain(jax.random.fold_in(key, salt + r))
        _sync(acc)
        return time.perf_counter() - t0

    reps = INNER * CHAINS
    timed_region(10_000)  # warmup region (also compiles the chain)
    rates = [b * reps / timed_region(1000 * i) for i in range(3)]
    spread_pct = 100 * (max(rates) - min(rates)) / float(np.median(rates))
    return float(np.median(rates)), round(spread_pct, 2)


def measure_torch_baseline() -> float:
    """Run the reference's own train loop (CPU torch) on the same data
    shapes. Returns steps/sec: the max of (median of 3 one-epoch runs this
    session, all historical medians). On a loaded 1-core host a single
    measurement is load noise — r03's single 6-batch re-measure dropped the
    cached value 37% and inflated vs_baseline (ADVICE r3) — and since load
    can only ever slow the loop down, max-over-history is the honest
    estimator of the machine's capability."""
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
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(sys.stderr):  # stdout = 1 JSON line
                ref_mnist.train(
                    x, a, x_test=x[:10], a_test={k: v[:10] for k, v in a.items()},
                    n_epochs=1, batch_size=BATCH, save_images_every=None,
                    device="cpu",
                )
            runs.append((n // BATCH) / (time.perf_counter() - t0))
        med = float(np.median(runs))
        hist = []
        if os.path.exists(CACHE):
            prev = json.load(open(CACHE))
            hist = prev.get("history", [prev.get("torch_steps_per_sec", 0.0)])
        hist.append(med)
        sps = max(hist)
        json.dump({
            "torch_steps_per_sec": sps,
            "history": hist,
            "last_runs": [round(r, 4) for r in runs],
            "conditions": {"n_batches": n // BATCH,
                           "loadavg_1m": os.getloadavg()[0]},
        }, open(CACHE, "w"))
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
    _watchdog(int(os.environ.get("BENCH_WATCHDOG_SECS", "2100")))
    gen = _chip_gen()
    peak = PEAK_FLOPS.get(gen, 197e12)
    ours, flops, nbytes = measure_mnist_train()  # primary: let failures surface
    cf = _safe(measure_cf_throughput, "cf throughput")
    fast = os.environ.get("BENCH_FAST")
    import jax.numpy as jnp

    cf_bf16 = None if fast else _safe(
        lambda: measure_cf_throughput(jnp.bfloat16), "cf bf16 throughput"
    )
    tput = None if fast else _safe(measure_mnist_throughput, "bf16 throughput")
    fused = None if fast else _safe(measure_mnist_fused, "fused throughput")
    audio = None if fast else _safe(measure_audio_train, "audio train")
    whale = None if fast else _safe(measure_whale_train, "whale train")
    esrf = None if fast else _safe(measure_esrf_train, "esrf train")
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
        "device": f"tpu-{gen}",
        "step_time_ms": round(1e3 / ours, 3),
        "gflops_per_step": round(flops / 1e9, 2) if flops == flops else None,
        "mfu_pct": round(100 * ours * flops / peak, 1) if flops == flops else None,
        # XLA cost-analysis operand bytes (overcounts true HBM traffic —
        # fusion-internal reuse is double-counted; see docs/PERF.md for the
        # analytic roofline): kept as a diagnostic, not a utilization claim.
        "cost_bytes_per_step_gb": (
            round(nbytes / 1e9, 3) if nbytes == nbytes else None
        ),
        "sync": "hard device->host fetch (block_until_ready unreliable on axon)",
    }
    if tput is not None:
        sps, fl, nb = tput
        record["bf16_b256_steps_per_sec"] = round(sps, 2)
        record["bf16_b256_mfu_pct"] = (
            round(100 * sps * fl / peak, 1) if fl == fl else None
        )
    if fused is not None:
        record["fused_f32_b64_steps_per_sec"] = round(fused[0], 2)
    if cf is not None:
        record["cf_images_per_sec"] = round(cf[0], 1)
        record["cf_spread_pct"] = cf[1]
        record["cf_protocol"] = "scanned-dispatch-480"
    if cf_bf16 is not None:
        record["cf_bf16_images_per_sec"] = round(cf_bf16[0], 1)
        record["cf_bf16_spread_pct"] = cf_bf16[1]
    if audio is not None:
        record["audio_bigan_steps_per_sec"] = round(audio[0], 2)
    if whale is not None:
        sps, fl, _ = whale
        record["whale_bigan_steps_per_sec"] = round(sps, 2)
        record["whale_batch_size"], record["whale_dtype"] = 32, "f32"
        if fl == fl:
            record["whale_mfu_pct"] = round(100 * sps * fl / peak, 1)
    if esrf is not None:
        sps, fl, _ = esrf
        record["esrf_bigan_steps_per_sec"] = round(sps, 2)
        record["esrf_batch_size"], record["esrf_dtype"] = 64, "bf16"
        if fl == fl:
            record["esrf_mfu_pct"] = round(100 * sps * fl / peak, 1)
    json.dump(record, open(LAST_GOOD, "w"))
    print(json.dumps(record))
    sys.stdout.flush()
    os._exit(0)  # skip interpreter teardown (axon tunnel can hang there)


if __name__ == "__main__":
    main()
