"""Measured CF parity for the VAE baseline: do(attr) median absolute
measurement error (successor of ``mnist_vae_measured_cf.py:156-262``)."""
from argparse import ArgumentParser
import multiprocessing
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-model-file", type=str, default=None,
                    help="VAE checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attr-model-file", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--cf-attribute", type=str, default=None,
                    choices=["thickness", "intensity", "slant"],
                    help="restrict to one intervened attribute (default: all three)")
parser.add_argument("--latent-dim", type=int, default=None,
                    help="accepted for reference CLI compatibility; the VAE "
                         "latent dim is fixed by the architecture/checkpoint "
                         "(the reference's own flag crashes its script: "
                         "MorphoMNISTVAE takes no latent_dim)")
parser.add_argument("--limit", type=int, default=256)
parser.add_argument("--workers", type=int, default=max(os.cpu_count() - 1, 1))
parser.add_argument("--output", type=str, default="mnist-vae-measured-cf.png")
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

    from imagecfgen_tpu.cli.common import load_attribute_scm, load_mnist_training_data
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.data.morphomnist_synth import GroundTruthSCM
    from imagecfgen_tpu.metrics.measured import (
        images_to_255,
        measure_attributes,
        median_abs_errors,
    )
    from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    n = min(args.limit, len(x))
    xb = jnp.asarray(x[:n])
    ab = {k: jnp.asarray(np.asarray(v)[:n]) for k, v in attrs.items()}

    vtree, _ = load_checkpoint(args.image_model_file or os.path.join(args.model_dir, "mnist-vae.tar"))
    scaler = AttributeScaler.from_state_dict(MNIST_SPEC, vtree["scaler"])
    scm = load_attribute_scm(args.attr_model_file or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    model = ConditionalVAE(mnist_vae_config())

    @jax.jit
    def vae_cf(xb, ab, cf_ab):
        mean, _ = model.encoder.apply(
            {"params": vtree["params"]["encoder"]}, xb, scaler.scale(ab)
        )
        return model.decoder.apply(
            {"params": vtree["params"]["decoder"]}, mean, scaler.scale(cf_ab)
        )

    gt = GroundTruthSCM(np.random.default_rng(args.seed))
    pool = multiprocessing.Pool(args.workers) if args.workers > 1 else None
    obs = {
        "thickness": ab["thickness"].reshape((-1, 1)),
        "intensity": ab["intensity"].reshape((-1, 1)),
        "slant": ab["slant"].reshape((-1, 1)),
        "digit": jnp.argmax(ab["digit"], axis=1),
    }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    attrs_to_do = (
        (args.cf_attribute,) if args.cf_attribute
        else ("thickness", "intensity", "slant")
    )
    fig, axs = plt.subplots(1, len(attrs_to_do), figsize=(13, 4), squeeze=False)
    axs = axs[0]
    errors = {}
    for i, attribute in enumerate(attrs_to_do):
        if attribute == "thickness":
            target = gt.sample_thickness(n) + args.target_shift
        elif attribute == "intensity":
            target = gt.sample_intensity(np.asarray(attrs["thickness"][:n]).reshape(-1, 1))
        else:
            target = gt.sample_slant(n)
        cf_obs = scm.sample_cf(
            jax.random.PRNGKey(args.seed + i), obs, {attribute: jnp.asarray(target)}
        )
        cf_ab = {
            "digit": jax.nn.one_hot(cf_obs["digit"].reshape((-1,)).astype(jnp.int32), 10),
            "thickness": cf_obs["thickness"].reshape((-1,)),
            "intensity": cf_obs["intensity"].reshape((-1,)),
            "slant": cf_obs["slant"].reshape((-1,)),
        }
        x_cf = vae_cf(xb, ab, cf_ab)
        measured = measure_attributes(images_to_255(np.asarray(x_cf)), pool=pool)
        err = median_abs_errors({attribute: target}, measured)
        errors.update(err)
        axs[i].plot([target.min(), target.max()], [target.min(), target.max()], "k--")
        axs[i].scatter(target[:, 0], measured[:, i], c="green", alpha=0.6, s=8)
        axs[i].set_title(f"{attribute.capitalize()} (median |err| {err[attribute]:.3f})")
    if pool is not None:
        pool.close()
    fig.suptitle("Morpho-MNIST measured CF parity (VAE)")
    fig.tight_layout()
    fig.savefig(args.output)
    print("median abs errors:", {k: round(v, 4) for k, v in errors.items()})
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
