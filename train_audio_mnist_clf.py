"""Train an AudioMNIST attribute classifier (digit / gender / accent /
country_of_origin / native_speaker / age, or the 60-way ``subject`` head
used by the identity-preservation metric).

Successor of ``classifiers/audio_mnist.py:67-307``: 7-conv CNN over
normalised spectrograms, saves ``audio-mnist-{attr}-clf.tar`` including the
spectrogram stats (reference keeps stats as npy prefixes next to the
model, ``classifiers/audio_mnist.py:200-219``).
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--zip-path", type=str, default=None)
parser.add_argument("--attribute", type=str, default="digit")
parser.add_argument("--epochs", type=int, default=30)
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--normalize", action="store_true", default=True,
                    help="train on spect_to_img normalised inputs")
parser.add_argument("--width", type=float, default=1.0,
                    help="channel-width multiplier (1.0 = reference widths)")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.audio_common import load_audio_dataset, prepare_training_arrays
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.data.audio_mnist import VALIDATION_RUNS
    from imagecfgen_tpu.models.classifier import CNNClassifier, audio_mnist_classifier_config
    from imagecfgen_tpu.train.clf_trainer import (
        SupervisedTrainConfig,
        SupervisedTrainer,
    )

    data = load_audio_dataset(args.zip_path)
    x, attrs, stats = prepare_training_arrays(data)

    if args.attribute == "subject":
        idx = data.split_indices(excluded_runs=data.training_excluded_runs)
        subjects = data.raw["subject"][idx] - 1  # 0-based 60-way
        y = np.eye(60, dtype=np.float32)[subjects]
        n_classes = 60
    else:
        y = attrs[args.attribute].astype(np.float32)
        n_classes = y.shape[1]

    clf = CNNClassifier(audio_mnist_classifier_config(n_classes, width=args.width))
    trainer = SupervisedTrainer(
        clf, SupervisedTrainConfig(learning_rate=args.l_rate, batch_size=args.batch_size)
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed), jnp.zeros((2, 128, 128, 1)))

    # validation = held-out runs
    vidx = np.nonzero(np.isin(data.raw["run"], data.validation_runs))[0]
    v_spects, v_attrs, _ = data.all_spectrograms(
        excluded_runs=data.validation_excluded_runs
    )
    xv = np.asarray(stats.spect_to_img(jnp.asarray(v_spects)))[..., None]
    if args.attribute == "subject":
        yv = data.raw["subject"][vidx] - 1
    else:
        yv = v_attrs[args.attribute].argmax(axis=1)

    data = trainer.upload_dataset(x, y)
    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        state, metrics = trainer.fit_epoch(state, data, jax.random.fold_in(key, epoch))
        msg = f"epoch {epoch + 1}/{args.epochs}: loss={float(metrics['loss']):.4f}"
        if len(xv) and (epoch + 1) % 5 == 0:
            msg += f" val_acc={trainer.accuracy(state, xv, yv):.4f}"
        print(msg)

    out = os.path.join(args.output_path or ".", f"audio-mnist-{args.attribute}-clf.tar")
    os.makedirs(args.output_path or ".", exist_ok=True)
    save_checkpoint(
        out,
        {
            "params": state.params,
            "spect_mean": np.asarray(stats.mean),
            "spect_std": np.asarray(stats.std),
        },
        meta={"kind": "audio-mnist-clf", "attribute": args.attribute,
              "n_classes": n_classes, "width": args.width},
    )
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
