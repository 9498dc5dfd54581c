"""Classifier-uncertainty evolution along the counterfactual mixture path:
entropy and class probabilities of the decoded image as the target-class
mixture weight sweeps 0 -> 1 (successor of ``uncertainty_evolution.py:40-120``)."""
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
parser.add_argument("--image-index", type=int, default=0)
parser.add_argument("--target-class", type=int, default=3)
parser.add_argument("--n-points", type=int, default=50)
parser.add_argument("--contrastive-steps", type=int, default=300,
                    help="optimization steps for the CEM PN/PP panels")
parser.add_argument("--output", type=str, default="uncertainty-evolution.png")

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    clf_tree, _ = load_checkpoint(os.path.join(
        args.model_dir,
        "mnist_clf.tar" if args.clf_type == "morpho" else "mnist_clf_raw.tar",
    ))
    model = BiGAN(mnist_bigan_config())
    clf = CNNClassifier(mnist_classifier_config())

    i = args.image_index
    p = args.n_points
    xb = jnp.asarray(x[i : i + 1])
    ab = {k: jnp.asarray(np.asarray(v)[i : i + 1]) for k, v in a_scaled.items()}
    original = int(np.asarray(attrs["digit"]).argmax(axis=1)[i])

    z = model.encoder.apply({"params": tree["params_E"]}, xb, ab)
    zr = jnp.repeat(z, p, axis=0)
    mix = jnp.linspace(0, 1, p)[:, None]
    eye = jnp.eye(10)
    cf_attrs = {k: jnp.repeat(v, p, axis=0) for k, v in ab.items() if k != "digit"}
    cf_attrs["digit"] = (1 - mix) * eye[original][None] + mix * eye[args.target_class][None]
    samples = model.generator.apply({"params": tree["params_G"]}, zr, cf_attrs)
    probs = np.asarray(jax.nn.softmax(clf.apply({"params": clf_tree["params"]}, samples), axis=1))
    entropy = -(probs * np.log(np.maximum(probs, 1e-12))).sum(axis=1)

    # contrastive panels (reference uncertainty_evolution.py:41-77 draws
    # the CEM pertinent negative/positive next to each original; built
    # from the framework's own CEM reimplementation)
    from imagecfgen_tpu.cf.baselines import PixelBaselineExplainers

    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))
    contrastive = PixelBaselineExplainers(clf_fn, steps=args.contrastive_steps)
    pn, _, pp, _ = contrastive.contrastive(xb)
    base = (np.asarray(xb)[0, :, :, 0] + 1) / 2
    pn_delta = np.asarray(pn)[0, :, :, 0] - np.asarray(xb)[0, :, :, 0]
    pp_img = (np.abs(np.asarray(pp)[0, :, :, 0]) > 0.01)
    pn_display = np.ones((28, 28, 3)) * base[:, :, None]
    pn_display[np.abs(pn_delta) > 0.01, :] = np.array([0, 1, 0])
    pp_display = np.ones((28, 28, 3)) * base[:, :, None]
    pp_display[pp_img, :] = np.array([0, 0, 1])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 5, figsize=(18, 3.5))
    ax1, ax2, ax3, ax4, ax5 = axes
    mixv = np.linspace(0, 1, p)
    for c in (original, args.target_class):
        ax1.plot(mixv, probs[:, c], label=f"class {c}")
    ax1.set_xlabel("mixture weight"); ax1.set_ylabel("probability"); ax1.legend()
    ax2.plot(mixv, entropy)
    ax2.set_xlabel("mixture weight"); ax2.set_ylabel("predictive entropy")
    ax3.imshow(base, cmap="gray"); ax3.set_title("original", fontsize=10)
    ax4.imshow(pn_display); ax4.set_title("pertinent negative", fontsize=10)
    ax5.imshow(pp_display); ax5.set_title("pertinent positive", fontsize=10)
    for ax in (ax3, ax4, ax5):
        ax.set_xticks([]); ax.set_yticks([])
    fig.suptitle(f"uncertainty evolution {original} -> {args.target_class}")
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
