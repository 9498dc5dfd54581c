"""Generation-quality score for the VAE decoder (successor of
``mnist_vae_generator_score.py``)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-model", "-m", type=str, default=None,
                    help="VAE checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attribute-model", "-a", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--classifier", "-c", type=str, default=None,
                    help="classifier checkpoint file (overrides --model-dir layout)")
parser.add_argument("--data-dir", type=str, default=None,
                    help="accepted for reference compatibility (generation "
                         "draws attributes from the SCM, not a dataset)")
parser.add_argument("--n", "-n", "--num-samples", type=int, default=10_000)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax

    from imagecfgen_tpu.cli.common import load_attribute_scm
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.metrics.scores import generator_score
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config
    from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config

    vae_tree, _ = load_checkpoint(args.image_model or os.path.join(args.model_dir, "mnist-vae.tar"))
    scaler = AttributeScaler.from_state_dict(MNIST_SPEC, vae_tree["scaler"])
    scm = load_attribute_scm(args.attribute_model or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    clf_tree, _ = load_checkpoint(args.classifier or os.path.join(args.model_dir, "mnist_clf.tar"))
    clf = CNNClassifier(mnist_classifier_config())
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    model = ConditionalVAE(mnist_vae_config())
    gen_fn = jax.jit(
        lambda z, a: model.decoder.apply({"params": vae_tree["params"]["decoder"]}, z, a)
    )
    acc = generator_score(gen_fn, clf_fn, scm, scaler, jax.random.PRNGKey(args.seed), n=args.n)
    print(f"vae generated-sample digit accuracy: {acc:.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
