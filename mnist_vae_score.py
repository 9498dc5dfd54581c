"""CF-effectiveness score for the VAE baseline (successor of
``mnist_vae_score.py:61-97``): abduct z by encoder-mean, intervene digit,
decode, classify."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-model", "-m", type=str, default=None,
                    help="VAE checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attribute-model", "-a", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--classifier", "-c", type=str, default=None,
                    help="classifier checkpoint file (overrides --model-dir layout)")
parser.add_argument("--batch-size", type=int, default=512)
parser.add_argument("--limit", type=int, default=4096)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--held-out-shift", nargs=3, type=float, default=None,
                    metavar=("THICKNESS", "INTENSITY", "SLANT"),
                    help="compound intervention: besides the digit swap, "
                         "shift each continuous attribute of the CF "
                         "conditioning beyond the training range "
                         "(hard-battery mode; mirrors mnist_bigan_score)")

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
    from imagecfgen_tpu.metrics.scores import resample_excluding
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config
    from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    x, attrs = x[: args.limit], {k: np.asarray(v)[: args.limit] for k, v in attrs.items()}

    vae_tree, _ = load_checkpoint(args.image_model or os.path.join(args.model_dir, "mnist-vae.tar"))
    scaler = AttributeScaler.from_state_dict(MNIST_SPEC, vae_tree["scaler"])
    scm = load_attribute_scm(args.attribute_model or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    clf_tree, _ = load_checkpoint(args.classifier or os.path.join(args.model_dir, "mnist_clf.tar"))
    clf = CNNClassifier(mnist_classifier_config())
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    model = ConditionalVAE(mnist_vae_config())

    @jax.jit
    def vae_cf(rng, xb, ab, new_digit):
        a_scaled = scaler.scale(ab)
        mean, _ = model.encoder.apply({"params": vae_tree["params"]["encoder"]}, xb, a_scaled)
        cf_ab = dict(ab)
        cf_ab["digit"] = jax.nn.one_hot(new_digit, 10)
        if args.held_out_shift:
            for name, dv in zip(("thickness", "intensity", "slant"),
                                args.held_out_shift):
                cf_ab[name] = cf_ab[name] + dv
        return model.decoder.apply(
            {"params": vae_tree["params"]["decoder"]}, mean, scaler.scale(cf_ab)
        )

    rng = jax.random.PRNGKey(args.seed)
    correct, total = 0, 0
    for i in range(0, len(x), args.batch_size):
        xb = jnp.asarray(x[i : i + args.batch_size])
        ab = {k: jnp.asarray(v[i : i + args.batch_size]) for k, v in attrs.items()}
        rng, k1 = jax.random.split(rng)
        obs = {"digit": jnp.argmax(ab["digit"], axis=1)}
        new_digit = resample_excluding(scm.graph, scm.params, scm.state, k1, "digit", obs)
        x_cf = vae_cf(rng, xb, ab, new_digit)
        pred = jnp.argmax(clf_fn(x_cf), axis=-1)
        correct += int((pred == new_digit).sum())
        total += len(xb)
    print(f"vae cf digit accuracy: {correct / total:.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
