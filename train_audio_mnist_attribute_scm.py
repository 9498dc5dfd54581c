"""Fit the AudioMNIST attribute causal graph by MLE (successor of
``attribute_scms.audio_mnist.train`` — no dedicated script in the
reference)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--zip-path", type=str, default=None)
parser.add_argument("--steps", type=int, default=2000)
parser.add_argument("--batch-size", type=int, default=10_000)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import numpy as np

    from imagecfgen_tpu.cli.audio_common import load_audio_dataset, save_audio_scm
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.scm.audio_mnist import AudioMNISTAttributeSCM

    data = load_audio_dataset(args.zip_path)
    attrs = data.encode_attrs(np.arange(len(data.raw["run"])))
    scm = AudioMNISTAttributeSCM.fit(
        attrs, steps=args.steps, batch_size=args.batch_size,
        rng=jax.random.PRNGKey(args.seed),
        log_every=max(args.steps // 20, 1),
    )
    out = os.path.join(args.output_path or ".", "audio-mnist-attribute-scm.tar")
    os.makedirs(args.output_path or ".", exist_ok=True)
    save_audio_scm(out, scm)
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
