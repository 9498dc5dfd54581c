"""Run both CF explainers on one test image and save the explanation strip
(successor of ``mnist_cf_explain.py:52-92``, which crashes on main — it
imports ``simple_cf_distance`` from an empty ``explain/__init__``;
SURVEY §4)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-scm", type=str, default=None,
                    help="BiGAN checkpoint file (overrides --model-dir layout)")
parser.add_argument("--classifier", type=str, default=None,
                    help="classifier checkpoint file (overrides --model-dir layout)")
parser.add_argument("--image-index", type=int, default=0)
parser.add_argument("--target-class", type=int, default=3)
parser.add_argument("--sample-points", type=int, default=50)
parser.add_argument("--steps", type=int, default=30)
parser.add_argument("--output", type=str, default="mnist-cf-explain.png")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cf.explain import DeepCounterfactualExplainer, HingeLossCFExplainer
    from imagecfgen_tpu.cli.common import (
        load_bigan,
        load_mnist_training_data,
        save_grid_png,
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

    tree, _, _ = load_bigan(args.image_scm or os.path.join(args.model_dir, "mnist-bigan.tar"))
    clf_tree, _ = load_checkpoint(args.classifier or os.path.join(args.model_dir, "mnist_clf.tar"))
    model = BiGAN(mnist_bigan_config())
    clf = CNNClassifier(mnist_classifier_config())
    E_fn = jax.jit(lambda xx, aa: model.encoder.apply({"params": tree["params_E"]}, xx, aa))
    G_fn = jax.jit(lambda zz, aa: model.generator.apply({"params": tree["params_G"]}, zz, aa))
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    i = args.image_index
    xb = jnp.asarray(x[i : i + 1])
    ab = {k: jnp.asarray(np.asarray(v)[i : i + 1]) for k, v in a_scaled.items()}

    deep = DeepCounterfactualExplainer(E_fn, G_fn, clf_fn, target_feature="digit")
    samples, mval = deep.explain(xb, ab, target_class=args.target_class,
                                 sample_points=args.sample_points)

    hinge = HingeLossCFExplainer(
        E_fn, G_fn, clf_fn, target_feature="digit", latent_dim=512,
        categorical_features=("digit",), features_to_ignore=("slant", "intensity"),
    )
    x_hinge = hinge.explain(xb, ab, target_class=args.target_class, steps=args.steps,
                            rng=jax.random.PRNGKey(args.seed))

    n_show = min(4, len(samples))
    rows = [
        np.repeat(np.asarray(xb).reshape(1, 28, 28), n_show, axis=0),
        np.asarray(samples[:n_show]).reshape(-1, 28, 28),
        np.repeat(np.asarray(x_hinge).reshape(1, 28, 28), n_show, axis=0),
    ]
    save_grid_png(
        args.output, rows, ["x", "mixture-sweep CFs", "hinge-loss CF"],
        title=f"CF explanations -> {args.target_class}",
    )
    print(f"best mixture weight: {float(mval[0]) if len(mval) else float('nan'):.3f}")
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
