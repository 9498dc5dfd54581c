"""Side-by-side CF comparison strips across explainers/models for a batch
of test images (successor of ``mnist_cf_comparisons.py:52-174``)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="mnist-displayed-cfs")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--clf-type", type=str, default="morpho",
                    choices=["morpho", "raw"],
                    help="morpho: mnist_clf.tar (Morpho-MNIST-trained); raw: "
                         "mnist_clf_raw.tar (plain-MNIST-trained, reference "
                         "uncertainty_evolution.py:25-27)")
parser.add_argument("--n-images", type=int, default=6)
parser.add_argument("--steps", type=int, default=30)
parser.add_argument("--output", type=str, default="mnist-cf-comparisons.png")
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
    n = args.n_images

    tree, _, _ = load_bigan(os.path.join(args.model_dir, "mnist-bigan.tar"))
    clf_tree, _ = load_checkpoint(os.path.join(
        args.model_dir,
        "mnist_clf.tar" if args.clf_type == "morpho" else "mnist_clf_raw.tar",
    ))
    model = BiGAN(mnist_bigan_config())
    clf = CNNClassifier(mnist_classifier_config())
    E_fn = jax.jit(lambda xx, aa: model.encoder.apply({"params": tree["params_E"]}, xx, aa))
    G_fn = jax.jit(lambda zz, aa: model.generator.apply({"params": tree["params_G"]}, zz, aa))
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    hinge = HingeLossCFExplainer(
        E_fn, G_fn, clf_fn, target_feature="digit", latent_dim=512,
        categorical_features=("digit",), features_to_ignore=("slant", "intensity"),
    )
    deep = DeepCounterfactualExplainer(E_fn, G_fn, clf_fn, "digit")

    rng = np.random.default_rng(args.seed)
    digits = np.asarray(attrs["digit"]).argmax(axis=1)
    originals, hinge_cfs, deep_cfs, targets = [], [], [], []
    for i in range(n):
        xb = jnp.asarray(x[i : i + 1])
        ab = {k: jnp.asarray(np.asarray(v)[i : i + 1]) for k, v in a_scaled.items()}
        target = int(rng.choice([c for c in range(10) if c != digits[i]]))
        targets.append(target)
        originals.append(np.asarray(xb).reshape(28, 28))
        cf = hinge.explain(xb, ab, target_class=target, steps=args.steps,
                           rng=jax.random.PRNGKey(args.seed + i))
        hinge_cfs.append(np.asarray(cf).reshape(28, 28))
        samples, _ = deep.explain(xb, ab, target_class=target, sample_points=50)
        deep_cfs.append(np.asarray(samples[0]).reshape(28, 28))

    # pixel-space baseline rows (reference mnist_cf_comparisons.py:52-66
    # shows omnixai's counterfactual + contrastive outputs alongside the
    # SCM explainers; built from the framework's own Wachter-CF / CEM
    # reimplementation, imagecfgen_tpu/cf/baselines.py)
    from imagecfgen_tpu.cf.baselines import PixelBaselineExplainers

    baselines = PixelBaselineExplainers(clf_fn, steps=args.steps * 10)
    x_all = jnp.asarray(x[:n])
    wachter_cfs, _ = baselines.counterfactual(x_all)
    pns, _, _, _ = baselines.contrastive(x_all)

    save_grid_png(
        args.output,
        [np.stack(originals), np.stack(hinge_cfs), np.stack(deep_cfs),
         np.asarray(wachter_cfs).reshape(n, 28, 28),
         np.asarray(pns).reshape(n, 28, 28)],
        ["x", "hinge CF", "mixture CF", "pixel CF", "CEM PN"],
        title="targets: " + " ".join(map(str, targets)),
    )
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
