"""Best-mixture counterfactual figure: original / best CF / difference map
/ classifier probabilities (successor of ``cf_automatic_mix.py:76-105``).
Works against the VAE (reference behaviour) or the BiGAN with --model bigan.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--model", type=str, default="vae", choices=["vae", "bigan"])
parser.add_argument("--original-digit", "--original", type=int, default=3)
parser.add_argument("--target-digit", "--target", type=int, default=8)
parser.add_argument("--sample-points", type=int, default=200)
parser.add_argument("--metric", type=str, default="ssim",
                    choices=["mixture", "mse", "ssim"])
parser.add_argument("--output", type=str, default="cf-automatic-mix.png")
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
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, scaler = load_mnist_training_data(args.data_dir, split)
    a_scaled = scale_attrs_np(scaler, attrs)
    digits = np.asarray(attrs["digit"]).argmax(axis=1)

    clf_tree, _ = load_checkpoint(os.path.join(args.model_dir, "mnist_clf.tar"))
    clf = CNNClassifier(mnist_classifier_config())
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    if args.model == "bigan":
        from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config

        tree, _, _ = load_bigan(os.path.join(args.model_dir, "mnist-bigan.tar"))
        model = BiGAN(mnist_bigan_config())
        enc = jax.jit(lambda xx, aa: model.encoder.apply({"params": tree["params_E"]}, xx, aa))
        dec = jax.jit(lambda zz, aa: model.generator.apply({"params": tree["params_G"]}, zz, aa))
    else:
        from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config

        vtree, _ = load_checkpoint(os.path.join(args.model_dir, "mnist-vae.tar"))
        vmodel = ConditionalVAE(mnist_vae_config())
        enc = jax.jit(
            lambda xx, aa: vmodel.encoder.apply({"params": vtree["params"]["encoder"]}, xx, aa)[0]
        )
        dec = jax.jit(
            lambda zz, aa: vmodel.decoder.apply({"params": vtree["params"]["decoder"]}, zz, aa)
        )

    explainer = DeepCounterfactualExplainer(enc, dec, clf_fn, "digit")

    original = args.original_digit
    if original is None:
        original = int(digits[0])
    i = int(np.nonzero(digits == original)[0][0])
    xb = jnp.asarray(x[i : i + 1])
    ab = {k: jnp.asarray(np.asarray(v)[i : i + 1]) for k, v in a_scaled.items()}

    samples, mval = explainer.explain(
        xb, ab, target_class=args.target_digit,
        sample_points=args.sample_points, metric=args.metric,
    )
    best = np.asarray(samples[0]).reshape(28, 28)
    orig = np.asarray(xb).reshape(28, 28)
    probs = np.asarray(jax.nn.softmax(clf_fn(jnp.asarray(samples[:1])), axis=1))[0]
    diff = (best - orig) / 2
    diff = np.where(diff < -0.1, -1.0, np.where(diff > 0.1, 1.0, diff))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 4, figsize=(14, 3.5))
    axs[0].imshow(orig, vmin=-1, vmax=1); axs[0].set_title(f"Original ({original})")
    axs[1].imshow(best, vmin=-1, vmax=1)
    axs[1].set_title(f"CF ({args.target_digit}) metric={float(mval[0]):.4f}")
    axs[2].imshow(diff, vmin=-1, vmax=1); axs[2].set_title("Difference")
    axs[3].bar(range(10), probs); axs[3].set_title("softmax probabilities")
    axs[3].set_xticks(list(range(10)))
    for ax in axs[:3]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
