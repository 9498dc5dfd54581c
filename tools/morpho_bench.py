"""Fixed measurement script for the host-side morphometry engines.

Reproducibly times ``measure_batch`` (C++ batch engine vs the per-image
python path — identical outputs, ``tests/test_native_engine.py``) and the
bare EDT+skeleton core, on deterministic synthetic glyphs. The RESULTS.md
/ README morphometry rows are produced by this script; rerun it after any
engine change (idle host — these are single-host CPU numbers).

Reference: ``morphomnist/measure.py:10-138`` (its only parallelism is a
process pool over python ``measure_image``).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_glyphs(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic stroke-like 28x28 glyphs (no dataset dependency)."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, 28, 28), np.float64)
    for i in range(n):
        pts = rng.uniform(4, 24, (4, 2))
        t = np.linspace(0, 1, 200)
        # quadratic Bezier strokes between consecutive control points
        for a, b, c in zip(pts[:-2], pts[1:-1], pts[2:]):
            xy = ((1 - t)[:, None] ** 2 * a + 2 * (t * (1 - t))[:, None] * b
                  + (t[:, None] ** 2) * c)
            for x, y in xy:
                xi, yi = int(round(x)), int(round(y))
                imgs[i, max(yi - 1, 0):yi + 1, max(xi - 1, 0):xi + 1] = 1.0
    return imgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from imagecfgen_tpu.morphomnist.measure import measure_batch
    from imagecfgen_tpu.morphomnist import engine as native_engine

    imgs = synth_glyphs(args.n)
    results = {}
    for eng in ("native", "python"):
        rates = []
        for _ in range(args.repeats):
            t0 = time.time()
            df = measure_batch(imgs, engine=eng)
            rates.append(len(imgs) / (time.time() - t0))
        results[eng] = max(rates)
        print(f"measure_batch[{eng}]: best {max(rates):.0f} img/s "
              f"(runs: {', '.join(f'{r:.0f}' for r in rates)})")

    # isolate the pipeline stages at the true working resolution (4x zoom
    # -> 112x112, what measure_batch actually feeds the engine)
    from imagecfgen_tpu.morphomnist.morpho import pyramid_expand

    t0 = time.time()
    hires = [pyramid_expand(im / max(im.max(), 1e-12), upscale=4) for im in imgs]
    up_rate = len(imgs) / (time.time() - t0)
    print(f"scipy/skimage 4x upsample alone: {up_rate:.0f} img/s  "
          f"(the python-side bottleneck of both engines)")

    binary = np.stack([im >= 0.5 for im in hires])
    rates = []
    for _ in range(args.repeats):
        t0 = time.time()
        native_engine.morphometry_batch(binary)
        rates.append(len(imgs) / (time.time() - t0))
    print(f"EDT+skeleton core (112x112 pre-binarised): best {max(rates):.0f} img/s")
    print(f"speedup native/python: {results['native'] / results['python']:.2f}x")


if __name__ == "__main__":
    main()
