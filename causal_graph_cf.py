"""Class-score curves as one attribute sweeps its range: for a handful of
test images, sweep do(attr = v) over a grid and plot the classifier's
class probabilities of the regenerated image.

Successor of ``causal_graph_cf.py:84-131``; on TPU the whole
(image x sweep-point) grid is one batched jitted pass.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--graph", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--image-scm", type=str, default=None,
                    help="BiGAN checkpoint file (overrides --model-dir layout)")
parser.add_argument("--classifier", type=str, default=None,
                    help="classifier checkpoint file (overrides --model-dir layout)")
parser.add_argument("cf_attribute", type=str, nargs="?", default=None,
                    help="positional attribute name (reference CLI); overrides --attr")
parser.add_argument("--attr", type=str, default="thickness")
parser.add_argument("--n-images", type=int, default=4)
parser.add_argument("--n-points", "-n", "--num-samples", type=int, default=10)
parser.add_argument("--output", type=str, default="causal-graph-cf.png")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    if args.cf_attribute:
        args.attr = args.cf_attribute
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cf.engine import CounterfactualEngine
    from imagecfgen_tpu.cli.common import (
        load_attribute_scm,
        load_bigan,
        load_mnist_training_data,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    n, p = args.n_images, args.n_points

    tree, scaler, _ = load_bigan(args.image_scm or os.path.join(args.model_dir, "mnist-bigan.tar"))
    scm = load_attribute_scm(args.graph or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    clf_tree, _ = load_checkpoint(args.classifier or os.path.join(args.model_dir, "mnist_clf.tar"))
    clf = CNNClassifier(mnist_classifier_config())
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))
    engine = CounterfactualEngine(
        BiGAN(mnist_bigan_config()), tree["params_E"], tree["params_G"], scm, scaler
    )

    lo = float(scaler.mins[args.attr])
    hi = float(scaler.maxs[args.attr])
    sweep = np.linspace(lo, hi, p).astype(np.float32)

    # tile images across sweep points -> one batched CF pass
    xb = jnp.asarray(np.repeat(x[:n], p, axis=0))
    ab = {k: jnp.asarray(np.repeat(np.asarray(v)[:n], p, axis=0)) for k, v in attrs.items()}
    target = jnp.asarray(np.tile(sweep, n).reshape(-1, 1))
    x_cf, _ = engine.counterfactual(jax.random.PRNGKey(args.seed), xb, ab, {args.attr: target})
    probs = jax.nn.softmax(clf_fn(x_cf), axis=1).reshape((n, p, 10))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3.2), squeeze=False)
    digits = np.asarray(attrs["digit"][:n]).argmax(axis=1)
    for i in range(n):
        for c in range(10):
            lw = 2.5 if c == digits[i] else 0.8
            axes[0, i].plot(sweep, np.asarray(probs[i, :, c]), lw=lw, label=str(c))
        axes[0, i].set_title(f"digit {digits[i]}")
        axes[0, i].set_xlabel(f"do({args.attr})")
    axes[0, 0].set_ylabel("class probability")
    axes[0, -1].legend(fontsize=6, ncol=2)
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
