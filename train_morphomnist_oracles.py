"""Train 10 binary per-digit oracle classifiers (BCE).

Successor of the reference ``train_morphomnist_oracles.py:12-73``; saves
``oracle-{d}.tar`` for each digit.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--epochs", type=int, default=20)
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.data.mnist import load_mnist_arrays
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_oracle_config
    from imagecfgen_tpu.train.clf_trainer import (
        SupervisedTrainConfig,
        SupervisedTrainer,
    )

    x, attrs = load_mnist_arrays(args.data_dir, "train")
    x = (2.0 * x.reshape((-1, 28, 28, 1)) / 255.0 - 1.0).astype(np.float32)
    digits = attrs["digit"].argmax(axis=1)

    os.makedirs(args.output_path or ".", exist_ok=True)
    for d in range(10):
        y = (digits == d).astype(np.float32).reshape(-1, 1)
        clf = CNNClassifier(mnist_oracle_config())
        trainer = SupervisedTrainer(
            clf, SupervisedTrainConfig(batch_size=args.batch_size, loss="bce")
        )
        state = trainer.init_state(
            jax.random.PRNGKey(args.seed + d), jnp.zeros((2, 28, 28, 1))
        )
        data = trainer.upload_dataset(x, y)
        key = jax.random.PRNGKey(args.seed + 100 + d)
        for epoch in range(args.epochs):
            state, metrics = trainer.fit_epoch(state, data, jax.random.fold_in(key, epoch))
        pred = np.asarray(trainer.predict(state, jnp.asarray(x[:2048]))) > 0
        acc = float((pred[:, 0] == (y[:2048, 0] > 0.5)).mean())
        out = os.path.join(args.output_path or ".", f"oracle-{d}.tar")
        save_checkpoint(out, {"params": state.params},
                        meta={"kind": "mnist-oracle", "digit": d})
        print(f"oracle {d}: train acc {acc:.4f} -> {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    clean_exit()
