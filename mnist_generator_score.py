"""Generation-quality score: classifier accuracy on G(z, a).

Successor of ``mnist_generator_score.py:63-76``. With ``--data-dir`` the
attributes are the test split's (the reference script's exact semantics);
without it they are drawn from the fitted attribute SCM.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-model", "-m", type=str, default=None,
                    help="BiGAN checkpoint file (overrides --model-dir layout)")
parser.add_argument("--classifier", "-c", type=str, default=None,
                    help="classifier checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attribute-model", "-a", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir "
                         "layout; the reference samples attributes from its "
                         "pickled graph implicitly)")
parser.add_argument("--data-dir", type=str, default=None,
                    help="score on this dir's mnist-a-test.npy attributes "
                         "(reference semantics) instead of SCM samples")
parser.add_argument("--n", type=int, default=4096)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax

    from imagecfgen_tpu.cli.common import load_attribute_scm, load_bigan
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.metrics.scores import generator_score
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config

    tree, scaler, _ = load_bigan(args.image_model or os.path.join(args.model_dir, "mnist-bigan.tar"))
    scm = load_attribute_scm(args.attribute_model or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    clf_tree, _ = load_checkpoint(args.classifier or os.path.join(args.model_dir, "mnist_clf.tar"))
    clf = CNNClassifier(mnist_classifier_config())
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    model = BiGAN(mnist_bigan_config())
    gen_fn = jax.jit(
        lambda z, a: model.generator.apply({"params": tree["params_G"]}, z, a)
    )
    test_attrs = None
    if args.data_dir is not None:
        from imagecfgen_tpu.cli.common import load_mnist_training_data

        _, test_attrs, _ = load_mnist_training_data(args.data_dir, "test")
        test_attrs = {k: v[: args.n] for k, v in test_attrs.items()}
    acc = generator_score(gen_fn, clf_fn, scm, scaler, jax.random.PRNGKey(args.seed),
                          n=args.n, attrs=test_attrs)
    print(f"generated-sample digit accuracy: {acc:.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
