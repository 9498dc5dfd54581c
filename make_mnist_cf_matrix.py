"""Build the 10x10 digit-counterfactual difficulty matrix: for sample
images of each source digit, run the mixture-sweep explainer toward every
target digit and record the minimal mixture weight that flips the
classifier (NaN if it never flips).

Successor of ``make_mnist_cf_matrix.py:65-102``; pairs with
``show_mnist_cf_matrix`` via ``show_cf_matrix.py``.
"""
from argparse import ArgumentParser
import os
import pickle

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--per-digit", type=int, default=4)
parser.add_argument("--sample-points", type=int, default=50)
parser.add_argument("--output", type=str, default="mnist-cf-matrix.pkl")
parser.add_argument("--metric", type=str, default="mixture",
                    choices=["mixture", "mse", "ssim"])
parser.add_argument("--seed", type=int, default=42)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cf.explain import DeepCounterfactualExplainer
    from imagecfgen_tpu.cli.common import (
        load_bigan,
        load_mnist_training_data,
        scale_attrs_np,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, scaler = load_mnist_training_data(args.data_dir, split)
    a_scaled = scale_attrs_np(scaler, attrs)

    tree, _, _ = load_bigan(os.path.join(args.model_dir, "mnist-bigan.tar"))
    clf_tree, _ = load_checkpoint(os.path.join(args.model_dir, "mnist_clf.tar"))
    model = BiGAN(mnist_bigan_config())
    clf = CNNClassifier(mnist_classifier_config())

    E_fn = jax.jit(lambda xx, aa: model.encoder.apply({"params": tree["params_E"]}, xx, aa))
    G_fn = jax.jit(lambda zz, aa: model.generator.apply({"params": tree["params_G"]}, zz, aa))
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    explainer = DeepCounterfactualExplainer(E_fn, G_fn, clf_fn, target_feature="digit")

    digits = np.asarray(attrs["digit"]).argmax(axis=1)
    matrix = np.full((10, 10), np.nan)
    counts = np.zeros((10, 10))
    for src in range(10):
        idx = np.nonzero(digits == src)[0][: args.per_digit]
        for k in idx:
            xb = jnp.asarray(x[k : k + 1])
            ab = {q: jnp.asarray(np.asarray(v)[k : k + 1]) for q, v in a_scaled.items()}
            for tgt in range(10):
                if tgt == src:
                    continue
                try:
                    samples, mval = explainer.explain(
                        xb, ab, target_class=tgt,
                        sample_points=args.sample_points, metric=args.metric,
                    )
                    preds = np.asarray(jnp.argmax(clf_fn(jnp.asarray(samples)), axis=1))
                    if (preds == tgt).any():
                        best = float(np.asarray(mval)[preds == tgt].min())
                        matrix[src, tgt] = np.nansum([matrix[src, tgt], best]) if counts[src, tgt] else best
                        counts[src, tgt] += 1
                except Exception as e:  # mirror the reference's tolerance
                    print(f"explainer failed for {src}->{tgt}: {e!r}")
    with np.errstate(invalid="ignore"):
        matrix = matrix / np.maximum(counts, 1)
        matrix[counts == 0] = np.nan
    with open(args.output, "wb") as f:
        pickle.dump({"matrix": matrix, "counts": counts, "metric": args.metric}, f)
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
