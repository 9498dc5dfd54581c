"""Synthesize the Morpho-MNIST test set.

Successor of the reference ``create_test_dataset.py``: like the train-set
script but for the test split; optionally takes thickness/intensity values
from a DeepSCM CSV (``--csv``, columns ``thickness``/``intensity`` —
reference ``create_test_dataset.py:94-109``) instead of sampling fresh.
"""
from argparse import ArgumentParser
import multiprocessing
import os

import numpy as np

parser = ArgumentParser()
parser.add_argument("--mnist-dir", type=str, default=None)
parser.add_argument("--synthetic", type=int, default=2048)
parser.add_argument("--csv", "--deepscm-csv", type=str, default=None,
                    help="optional DeepSCM csv supplying thickness/intensity")
parser.add_argument("--out-dir", type=str, default="")
parser.add_argument("--seed", type=int, default=1)
parser.add_argument("--scale", type=int, default=16)
parser.add_argument("--workers", type=int, default=max(os.cpu_count() - 1, 1))
parser.add_argument("--limit", type=int, default=None)
parser.add_argument("--noise-std", type=float, default=0.0,
                    help="additive Gaussian pixel noise (0-255 scale); match "
                         "the train split's value for the hard battery mode")

if __name__ == "__main__":
    args = parser.parse_args()
    from imagecfgen_tpu.data.morphomnist_synth import GroundTruthSCM, synthesize_dataset
    from imagecfgen_tpu.data.synthetic_digits import synthetic_digits

    if args.mnist_dir:
        from imagecfgen_tpu.data.mnist import load_raw_mnist

        images, labels = load_raw_mnist(args.mnist_dir, "test")
        images = images.astype(np.float32) / 255.0
    else:
        images, labels = synthetic_digits(args.synthetic, seed=args.seed)
        images = images / 255.0
    if args.limit:
        images, labels = images[: args.limit], labels[: args.limit]

    attrs = None
    if args.csv:
        import pandas as pd

        df = pd.read_csv(args.csv)
        n = len(images)
        rng = np.random.default_rng(args.seed)
        attrs = {
            "thickness": df["thickness"].to_numpy()[:n],
            "intensity": df["intensity"].to_numpy()[:n],
            "slant": GroundTruthSCM(rng).sample_slant(n)[:, 0],
        }

    pool = multiprocessing.Pool(args.workers) if args.workers > 1 else None
    x, a = synthesize_dataset(
        images, labels, seed=args.seed, scale=args.scale, pool=pool,
        attrs=attrs, progress=True,
    )
    if pool is not None:
        pool.close()

    if args.noise_std > 0:
        noise_rng = np.random.default_rng(args.seed + 7920)
        x = np.clip(
            x + noise_rng.normal(0.0, args.noise_std, x.shape), 0, 255
        ).astype(np.float32)

    os.makedirs(args.out_dir or ".", exist_ok=True)
    np.save(os.path.join(args.out_dir, "mnist-x-test.npy"), x)
    np.save(os.path.join(args.out_dir, "mnist-a-test.npy"), a)
    print(f"wrote {len(x)} test images to {args.out_dir or '.'}")
