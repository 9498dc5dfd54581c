"""Fit the MNIST attribute SCM (flows + categorical) by MLE.

Successor of the reference ``train_mnist_attribute_scm.py``: same flags,
same ``mnist-attribute-scm.tar`` artifact, same sample-vs-data histogram
sanity plots (``train_mnist_attribute_scm.py:34-43``).
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--steps", type=int, default=200)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--batch-size", type=int, default=10_000)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import numpy as np

    from imagecfgen_tpu.cli.common import save_attribute_scm
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.data.mnist import load_mnist_arrays
    from imagecfgen_tpu.scm.mnist import MNISTAttributeSCM

    _, attrs = load_mnist_arrays(args.data_dir, "train")
    scm = MNISTAttributeSCM.fit(
        attrs,
        steps=args.steps,
        batch_size=min(args.batch_size, len(attrs["thickness"])),
        rng=jax.random.PRNGKey(args.seed),
        log_every=max(args.steps // 20, 1),
    )

    out = os.path.join(args.output_path or ".", "mnist-attribute-scm.tar")
    os.makedirs(args.output_path or ".", exist_ok=True)
    save_attribute_scm(out, scm)
    print(f"saved {out}")

    # sanity histograms: model samples vs observed data
    samp = scm.sample(jax.random.PRNGKey(args.seed + 1), n=10_000)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    for ax, name in zip(axes, ("thickness", "intensity", "slant")):
        ax.hist(np.asarray(attrs[name]).ravel(), bins=50, alpha=0.5, label="data", density=True)
        ax.hist(np.asarray(samp[name]).ravel(), bins=50, alpha=0.5, label="model", density=True)
        ax.set_title(name)
        ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.output_path or ".", "attribute-scm-hists.png"))
    print("saved attribute-scm-hists.png")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
