"""Synthesize the Morpho-MNIST training set with the ground-truth SCM.

Drop-in successor of the reference ``create_train_dataset.py``: emits
``mnist-x-train.npy`` (N,28,28) and ``mnist-a-train.npy`` (N,13) in the
same column layout. Sources digits from raw MNIST IDX files when
``--mnist-dir`` is given; otherwise renders the built-in synthetic glyphs
(this image has no bundled MNIST and no network egress).
"""
from argparse import ArgumentParser
import multiprocessing
import os

import numpy as np

parser = ArgumentParser()
parser.add_argument("--mnist-dir", type=str, default=None,
                    help="directory with raw MNIST IDX files (train-images-idx3-ubyte[.gz])")
parser.add_argument("--synthetic", type=int, default=8192,
                    help="number of synthetic glyphs when --mnist-dir is absent")
parser.add_argument("--out-dir", type=str, default="")
parser.add_argument("--split", type=str, default="train", choices=["train", "test"])
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--scale", type=int, default=16,
                    help="morphology upscale factor (reference uses 16)")
parser.add_argument("--workers", type=int, default=max(os.cpu_count() - 1, 1))
parser.add_argument("--limit", type=int, default=None)
parser.add_argument("--noise-std", type=float, default=0.0,
                    help="additive Gaussian pixel noise (0-255 scale) applied "
                         "after synthesis — the 'hard' battery mode that keeps "
                         "classifier/CF accuracies off the 1.0 ceiling so "
                         "regressions stay detectable")

if __name__ == "__main__":
    args = parser.parse_args()
    from imagecfgen_tpu.data.morphomnist_synth import synthesize_dataset
    from imagecfgen_tpu.data.synthetic_digits import synthetic_digits

    if args.mnist_dir:
        from imagecfgen_tpu.data.mnist import load_raw_mnist

        images, labels = load_raw_mnist(args.mnist_dir, args.split)
        images = images.astype(np.float32) / 255.0
    else:
        images, labels = synthetic_digits(args.synthetic, seed=args.seed + (1 if args.split == "test" else 0))
        images = images / 255.0
    if args.limit:
        images, labels = images[: args.limit], labels[: args.limit]

    pool = multiprocessing.Pool(args.workers) if args.workers > 1 else None
    x, a = synthesize_dataset(
        images, labels, seed=args.seed, scale=args.scale, pool=pool, progress=True
    )
    if pool is not None:
        pool.close()

    if args.noise_std > 0:
        noise_rng = np.random.default_rng(args.seed + 7919)
        x = np.clip(
            x + noise_rng.normal(0.0, args.noise_std, x.shape), 0, 255
        ).astype(np.float32)

    os.makedirs(args.out_dir or ".", exist_ok=True)
    np.save(os.path.join(args.out_dir, f"mnist-x-{args.split}.npy"), x)
    np.save(os.path.join(args.out_dir, f"mnist-a-{args.split}.npy"), a)
    print(f"wrote {len(x)} images to {args.out_dir or '.'} (split={args.split})")
