"""Generation quality for the AudioMNIST VAE decoder (successor of
``audiomnist_vae_generator_score.py``)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--attribute", type=str, default="digit")
parser.add_argument("--n", type=int, default=1024)
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

    vtree, _ = load_checkpoint(os.path.join(args.model_dir, "audio-mnist-vae.tar"))
    scm = load_audio_scm(os.path.join(args.model_dir, "audio-mnist-attribute-scm.tar"))
    ctree, _ = load_checkpoint(
        os.path.join(args.model_dir, f"audio-mnist-{args.attribute}-clf.tar")
    )
    clf = CNNClassifier(audio_mnist_classifier_config(CARDINALITIES[args.attribute]))
    clf_fn = jax.jit(lambda im: clf.apply({"params": ctree["params"]}, im))
    model = ConditionalVAE(audio_mnist_vae_config())
    dec = jax.jit(
        lambda z, a: model.decoder.apply({"params": vtree["params"]["decoder"]}, z, a)
    )

    rng = jax.random.PRNGKey(args.seed)
    correct = 0
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
    print(f"vae generated {args.attribute} accuracy: {correct / args.n:.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
