"""Train the NARW call-type classifier (successor of ``train_whale_clf.py``
/ ``classifiers/whalecalls.py``): 8-conv CNN, CE over 3 call types."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--nocall-dir", type=str, default=None)
parser.add_argument("--shotgun-dir", type=str, default=None)
parser.add_argument("--upcall-dir", type=str, default=None)
parser.add_argument("--synthetic-clips", type=int, default=32,
                    help="per-class clip count for the synthetic stand-in "
                    "(ignored when real data dirs are given)")
parser.add_argument("--epochs", type=int, default=30)
parser.add_argument("--batch-size", type=int, default=32)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--filter-length", type=int, default=None)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--width", type=float, default=1.0)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.whale_common import collect_whale_arrays, load_whale_dataset
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.models.classifier import CNNClassifier, narw_classifier_config
    from imagecfgen_tpu.train.clf_trainer import (
        SupervisedTrainConfig,
        SupervisedTrainer,
    )

    data = load_whale_dataset(args.nocall_dir, args.shotgun_dir, args.upcall_dir,
                              filter_length=args.filter_length,
                              synthetic_clips=args.synthetic_clips)
    x, y, stats = collect_whale_arrays(data, "train")
    xv, yv_onehot, _ = collect_whale_arrays(data, "validation")
    yv = yv_onehot.argmax(axis=1)

    clf = CNNClassifier(narw_classifier_config(3, width=args.width))
    trainer = SupervisedTrainer(
        clf, SupervisedTrainConfig(learning_rate=args.l_rate, batch_size=args.batch_size)
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed), jnp.zeros((2, 256, 256, 1)))

    data = trainer.upload_dataset(x, y)
    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        state, metrics = trainer.fit_epoch(state, data, jax.random.fold_in(key, epoch))
        msg = f"epoch {epoch + 1}/{args.epochs}: loss={float(metrics['loss']):.4f}"
        if len(xv) and (epoch + 1) % 5 == 0:
            msg += f" val_acc={trainer.accuracy(state, xv, yv):.4f}"
        print(msg)

    out = os.path.join(args.output_path or ".", "whale-clf.tar")
    os.makedirs(args.output_path or ".", exist_ok=True)
    save_checkpoint(
        out,
        {
            "params": state.params,
            "spect_mean": np.asarray(stats.mean),
            "spect_std": np.asarray(stats.std),
        },
        meta={"kind": "whale-clf", "width": args.width},
    )
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
