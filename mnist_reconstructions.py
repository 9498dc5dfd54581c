"""Side-by-side reconstruction grids for BiGAN (and fine-tuned variants).

Successor of ``mnist_reconstructions.py:54-84``.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-files", type=str, nargs="+", default=["mnist-bigan.tar"])
parser.add_argument("--n-images", type=int, default=10)
parser.add_argument("--output", type=str, default="mnist-reconstructions.png")

if __name__ == "__main__":
    args = parser.parse_args()
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cf.engine import CounterfactualEngine
    from imagecfgen_tpu.cli.common import load_bigan, load_mnist_training_data, save_grid_png
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    n = args.n_images
    xb = jnp.asarray(x[:n])
    ab = {k: jnp.asarray(np.asarray(v)[:n]) for k, v in attrs.items()}

    model = BiGAN(mnist_bigan_config())
    rows = [np.asarray(xb).reshape(n, 28, 28)]
    labels = ["x"]
    for mf in args.model_files:
        tree, scaler, _ = load_bigan(mf)
        engine = CounterfactualEngine(model, tree["params_E"], tree["params_G"], None, scaler)
        rec = engine.reconstruct(xb, ab)
        rows.append(np.asarray(rec).reshape(n, 28, 28))
        labels.append(os.path.basename(mf).replace(".tar", ""))

    save_grid_png(args.output, rows, labels, title="Reconstructions")
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
