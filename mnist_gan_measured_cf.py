"""Measured CF parity for the BiGAN: do(attr) with targets sampled from the
ground-truth SCM, regenerate, measure with the morphometry oracle, and plot
target-vs-measured scatter per attribute (+ median abs errors).

Successor of ``mnist_gan_measured_cf.py:60-135`` (which crashes on main —
it imports a ``GroundTruthCausalGraph`` that does not exist; SURVEY §4 —
the ground-truth SCM here is ``data/morphomnist_synth.py``).
"""
from argparse import ArgumentParser
import multiprocessing
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-model", type=str, default="mnist-bigan.tar")
parser.add_argument("--attribute-model", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--model-name", type=str, default="ImageCFGen",
                    help="label used in the figure title")
parser.add_argument("--limit", type=int, default=256)
parser.add_argument("--workers", type=int, default=max(os.cpu_count() - 1, 1))
parser.add_argument("--output", type=str, default="mnist-gan-measured-cf.png")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--target-shift", type=float, default=0.0,
                    help="add a constant to the sampled thickness targets, "
                         "pushing interventions beyond the training range "
                         "(held-out magnitudes — the hard battery mode)")

if __name__ == "__main__":
    args = parser.parse_args()
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
    from imagecfgen_tpu.data.morphomnist_synth import GroundTruthSCM
    from imagecfgen_tpu.metrics.measured import (
        images_to_255,
        measure_attributes,
        median_abs_errors,
    )
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    n = min(args.limit, len(x))
    xb = jnp.asarray(x[:n])
    ab = {k: jnp.asarray(np.asarray(v)[:n]) for k, v in attrs.items()}

    tree, scaler, _ = load_bigan(os.path.join(args.model_dir, args.image_model))
    scm = load_attribute_scm(args.attribute_model or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    model = BiGAN(mnist_bigan_config())
    engine = CounterfactualEngine(model, tree["params_E"], tree["params_G"], scm, scaler)

    gt = GroundTruthSCM(np.random.default_rng(args.seed))
    pool = multiprocessing.Pool(args.workers) if args.workers > 1 else None

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 3, figsize=(13, 4))
    errors = {}
    for i, attribute in enumerate(("thickness", "intensity", "slant")):
        if attribute == "thickness":
            target = gt.sample_thickness(n) + args.target_shift
        elif attribute == "intensity":
            target = gt.sample_intensity(np.asarray(attrs["thickness"][:n]).reshape(-1, 1))
        else:
            target = gt.sample_slant(n)
        x_cf, _ = engine.counterfactual(
            jax.random.PRNGKey(args.seed + i), xb, ab, {attribute: jnp.asarray(target)}
        )
        measured = measure_attributes(images_to_255(np.asarray(x_cf)), pool=pool)
        err = median_abs_errors({attribute: target}, measured)
        errors.update(err)
        axs[i].plot([target.min(), target.max()], [target.min(), target.max()], "k--")
        axs[i].scatter(target[:, 0], measured[:, i], c="blue", alpha=0.6, s=8)
        axs[i].set_xlabel("Target value")
        axs[i].set_ylabel("Measured value")
        axs[i].set_title(f"{attribute.capitalize()} (median |err| {err[attribute]:.3f})")
    if pool is not None:
        pool.close()
    fig.suptitle(f"Morpho-MNIST measured CF parity ({args.model_name})")
    fig.tight_layout()
    fig.savefig(args.output)
    print("median abs errors:", {k: round(v, 4) for k, v in errors.items()})
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
