"""Generation quality for the whale BiGAN: NARW-classifier accuracy on
G(z, call_type) with uniform call types (successor of
``whale_generator_score.py:39-62``)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--bigan", type=str, default="whale-bigan.tar")
parser.add_argument("--clf", type=str, default="whale-clf.tar")
parser.add_argument("--n", type=int, default=512)
parser.add_argument("--batch-size", type=int, default=64)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp

    from imagecfgen_tpu.cli.whale_common import load_whale_bigan
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.bigan import BiGAN, whale_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, narw_classifier_config

    tree, stats, _meta = load_whale_bigan(os.path.join(args.model_dir, args.bigan))
    ctree, cmeta = load_checkpoint(os.path.join(args.model_dir, args.clf))
    clf = CNNClassifier(narw_classifier_config(3, width=cmeta.get("width", 1.0)))
    clf_fn = jax.jit(lambda im: clf.apply({"params": ctree["params"]}, im))
    model = BiGAN(whale_bigan_config(d=_meta.get("d", 64)))
    G_apply = jax.jit(lambda z, a: model.generator.apply({"params": tree["params_G"]}, z, a))

    rng = jax.random.PRNGKey(args.seed)
    correct = 0
    for i in range(0, args.n, args.batch_size):
        b = min(args.batch_size, args.n - i)
        rng, k1, k2 = jax.random.split(rng, 3)
        labels = jax.random.randint(k1, (b,), 0, 3)
        attrs = {"call_type": jax.nn.one_hot(labels, 3)}
        z = jax.random.normal(k2, (b, 1, 1, 512))
        pred = jnp.argmax(clf_fn(G_apply(z, attrs)), axis=1)
        correct += int((pred == labels).sum())
    print(f"generated call-type accuracy: {correct / args.n:.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
