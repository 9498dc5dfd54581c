"""Reconcile the CF-throughput metric across timed-region protocols.

Round 3 recorded 74,447 CF images/s with a fixed 20-rep timed region;
round 4's duration-calibrated protocol (every region >= 2 s) recorded
122,147 — a +64% jump that needs an explanation before either number is
trustworthy (VERDICT r4 weak item 3 / item 4).

Hypothesis under test: the timed region contains a fixed, per-region cost
C (the final device->host sync over the axon tunnel plus first-dispatch
latency) on top of the per-rep step time t. A 20-rep region at ~17 ms/rep
is ~0.34 s of work, so C of a couple hundred ms inflates the measured
time per image by tens of percent; a >= 2 s region amortizes C below the
noise floor. If that is right, measured rate vs region length follows
rate(T) = R_inf * T_work / (T_work + C) and flattens as regions grow.

This probe measures the identical jitted CF program (bench.py's
measure_cf_throughput chain) over region lengths from the legacy 20 reps
up to 16 s, several regions per length, and prints a JSONL row per
region so the flattening (or its absence) is recorded, not assumed.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    import jax

    import bench

    # reuse the exact bench chain by rebuilding it the way
    # measure_cf_throughput does, but exposing the timed region knobs
    import jax.numpy as jnp

    from imagecfgen_tpu.cf.engine import CounterfactualEngine
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.scm.mnist import MNISTAttributeSCM
    from imagecfgen_tpu.utils.profiling import sync

    b = 2048
    x, attrs = bench._mnist_data(b)
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
    sync(out)  # compile

    def timed_region(reps, salt):
        t0 = time.perf_counter()
        for r in range(reps):
            out, _ = engine.counterfactual(
                jax.random.fold_in(key, salt + r), xb, ab, iv)
        sync(out)
        return time.perf_counter() - t0

    # per-rep time from a long calibration region (C amortized away)
    cal = timed_region(200, 999_000)
    per_rep = cal / 200
    print(json.dumps({"calibration_200rep_s": cal, "per_rep_ms": 1e3 * per_rep}),
          flush=True)

    for reps in (20, 50, 120, 240, 480, 960):
        rates = []
        for k in range(4):
            dt = timed_region(reps, 1000 * reps + 31 * k)
            rates.append(b * reps / dt)
        row = {
            "reps": reps,
            "nominal_region_s": round(reps * per_rep, 3),
            "rates_img_s": [round(r, 1) for r in rates],
            "median_img_s": round(float(np.median(rates)), 1),
            "spread_pct": round(
                100 * (max(rates) - min(rates)) / float(np.median(rates)), 2),
        }
        print(json.dumps(row), flush=True)

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()


if __name__ == "__main__":
    main()
