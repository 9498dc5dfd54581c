"""Train per-class (and all-class) conv autoencoders for CF realism metrics.

Successor of the reference ``train_morphomnist_ae.py:61-118`` (``--cls``
selects one digit; ``--cls -1`` trains on all digits); saves
``ae-{cls}.tar`` / ``ae-all.tar``.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--cls", type=int, default=-1, help="-1 = all classes")
parser.add_argument("--epochs", "--steps", type=int, default=200)
parser.add_argument("--batch-size", type=int, default=64)
parser.add_argument("--latent-dim", type=int, default=100,
                    help="AE bottleneck size (reference default 100)")
parser.add_argument("--learning-rate", type=float, default=1e-4)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.data.mnist import load_mnist_arrays
    from imagecfgen_tpu.models.classifier import AutoEncoderConfig, ConvAutoEncoder
    from imagecfgen_tpu.train.clf_trainer import (
        SupervisedTrainConfig,
        SupervisedTrainer,
    )

    x, attrs = load_mnist_arrays(args.data_dir, "train")
    x = (2.0 * x.reshape((-1, 28, 28, 1)) / 255.0 - 1.0).astype(np.float32)
    if args.cls >= 0:
        mask = attrs["digit"].argmax(axis=1) == args.cls
        x = x[mask]

    ae = ConvAutoEncoder(AutoEncoderConfig(latent_dim=args.latent_dim))
    trainer = SupervisedTrainer(
        ae, SupervisedTrainConfig(batch_size=args.batch_size, loss="mse",
                              learning_rate=args.learning_rate)
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed), jnp.zeros((2, 28, 28, 1)))
    data = trainer.upload_dataset(x, x)
    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        state, metrics = trainer.fit_epoch(state, data, jax.random.fold_in(key, epoch))
        if (epoch + 1) % 10 == 0:
            print(f"epoch {epoch + 1}/{args.epochs}: mse={float(metrics['loss']):.5f}")

    name = "all" if args.cls < 0 else str(args.cls)
    out = os.path.join(args.output_path or ".", f"ae-{name}.tar")
    os.makedirs(args.output_path or ".", exist_ok=True)
    save_checkpoint(out, {"params": state.params},
                    meta={"kind": "mnist-ae", "cls": args.cls})
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    clean_exit()
