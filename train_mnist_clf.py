"""Train the MNIST digit classifier (CF metric oracle).

Successor of the reference ``train_mnist_clf.py`` / ``classifiers/mnist.py``:
cross-entropy on [-1,1]-scaled images, Adam 1e-4, saves ``mnist_clf.tar``.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--epochs", type=int, default=10)
parser.add_argument("--batch-size", type=int, default=512)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--output-name", type=str, default="mnist_clf.tar",
                    help="e.g. mnist_clf_raw.tar when training on plain MNIST "
                         "(consumed by --clf-type raw in the eval scripts)")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.data.mnist import load_mnist_arrays
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config
    from imagecfgen_tpu.train.clf_trainer import (
        SupervisedTrainConfig,
        SupervisedTrainer,
    )

    x, attrs = load_mnist_arrays(args.data_dir, "train")
    x = (2.0 * x.reshape((-1, 28, 28, 1)) / 255.0 - 1.0).astype(np.float32)
    y = attrs["digit"].astype(np.float32)
    try:
        x_test, attrs_test = load_mnist_arrays(args.data_dir, "test")
        x_test = (2.0 * x_test.reshape((-1, 28, 28, 1)) / 255.0 - 1.0).astype(np.float32)
        y_test = attrs_test["digit"].argmax(axis=1)
    except FileNotFoundError:
        x_test = y_test = None

    clf = CNNClassifier(mnist_classifier_config())
    trainer = SupervisedTrainer(clf, SupervisedTrainConfig(batch_size=args.batch_size))
    state = trainer.init_state(jax.random.PRNGKey(args.seed), jnp.zeros((2, 28, 28, 1)))

    data = trainer.upload_dataset(x, y)
    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        state, metrics = trainer.fit_epoch(state, data, jax.random.fold_in(key, epoch))
        msg = f"epoch {epoch + 1}/{args.epochs}: loss={float(metrics['loss']):.4f}"
        if x_test is not None and (epoch + 1) % 5 == 0:
            msg += f" val_acc={trainer.accuracy(state, x_test, y_test):.4f}"
        print(msg)

    out = os.path.join(args.output_path or ".", args.output_name)
    os.makedirs(args.output_path or ".", exist_ok=True)
    save_checkpoint(out, {"params": state.params}, meta={"kind": "mnist-clf"})
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    clean_exit()
