"""Generation quality for the AudioMNIST VAE decoder (successor of
``audiomnist_vae_generator_score.py``)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-model", "-m", type=str, default=None,
                    help="VAE checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attribute-model", "-a", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--digit-clf", type=str, default=None)
parser.add_argument("--gender-clf", type=str, default=None)
parser.add_argument("--accent-clf", type=str, default=None)
parser.add_argument("--zip-path", "-d", "--data", type=str,
                    default="AudioMNIST-data.zip",
                    help="accepted for reference compatibility (generation "
                         "needs no dataset)")
parser.add_argument("--mc-rounds", "-r", type=int, default=4,
                    help="scoring passes with fresh z draws, averaged")
parser.add_argument("--attribute", type=str, default="digit")
parser.add_argument("--n", "-n", "--num-samples", type=int, default=10_000)
parser.add_argument("--batch-size", type=int, default=256)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp

    from imagecfgen_tpu.cli.audio_common import load_audio_scm
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.classifier import CNNClassifier, audio_mnist_classifier_config
    from imagecfgen_tpu.models.vae import ConditionalVAE, audio_mnist_vae_config
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES

    vtree, vmeta = load_checkpoint(args.image_model or os.path.join(args.model_dir, "audio-mnist-vae.tar"))
    scm = load_audio_scm(args.attribute_model or os.path.join(args.model_dir, "audio-mnist-attribute-scm.tar"))
    ctree, _ = load_checkpoint(
        {"digit": args.digit_clf, "gender": args.gender_clf, "accent": args.accent_clf}.get(args.attribute)
        or os.path.join(args.model_dir, f"audio-mnist-{args.attribute}-clf.tar")
    )
    clf = CNNClassifier(audio_mnist_classifier_config(CARDINALITIES[args.attribute]))
    clf_fn = jax.jit(lambda im: clf.apply({"params": ctree["params"]}, im))
    model = ConditionalVAE(audio_mnist_vae_config(d=vmeta.get("d", 64)))
    dec = jax.jit(
        lambda z, a: model.decoder.apply({"params": vtree["params"]["decoder"]}, z, a)
    )

    rng = jax.random.PRNGKey(args.seed)
    correct = 0
    for _r in range(args.mc_rounds):
        for i in range(0, args.n, args.batch_size):
            b = min(args.batch_size, args.n - i)
            rng, k1, k2 = jax.random.split(rng, 3)
            samp = scm.sample(k1, n=b)
            attrs = {
                k: jax.nn.one_hot(samp[k].reshape((-1,)).astype(jnp.int32), card)
                for k, card in CARDINALITIES.items()
            }
            z = jax.random.normal(k2, (b, 1, 1, 512))
            pred = jnp.argmax(clf_fn(dec(z, attrs)), axis=1)
            correct += int((pred == samp[args.attribute].reshape((-1,))).sum())
    print(f"vae generated {args.attribute} accuracy: "
          f"{correct / (args.n * args.mc_rounds):.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
