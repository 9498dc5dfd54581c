"""Encoder-only fine-tuning for the AudioMNIST BiGAN (successor of
``finetune_audio_mnist_bigan.py:57-99``)."""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--zip-path", "-d", "--data", type=str, default=None)
parser.add_argument("--model-file", type=str, default="audio-mnist-bigan.tar")
parser.add_argument("--steps", type=int, default=20, help="epochs")
parser.add_argument("--metric", type=str, default="mse", choices=["mse", "ssim"])
parser.add_argument("--lr", type=float, default=1e-5)
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling

    from imagecfgen_tpu.cf.finetune import EncoderFinetuner, FinetuneConfig
    from imagecfgen_tpu.cli.audio_common import (
        load_audio_bigan,
        load_audio_dataset,
        prepare_training_arrays,
        save_audio_bigan,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config

    data = load_audio_dataset(args.zip_path)
    x, attrs, stats = prepare_training_arrays(data)
    tree, stats_ckpt, meta = load_audio_bigan(args.model_file)

    model = BiGAN(audio_mnist_bigan_config())
    ft = EncoderFinetuner(
        model, tree["params_G"],
        FinetuneConfig(learning_rate=args.lr, batch_size=args.batch_size, metric=args.metric),
    )
    state = ft.init_state(tree["params_E"], jax.random.PRNGKey(args.seed))
    device_data = ft.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(args.seed + 1)

    for epoch in range(args.steps):
        t0 = time.time()
        state, metrics = ft.fit_epoch(state, device_data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        print(
            f"epoch {epoch + 1}/{args.steps}: {args.metric}={float(metrics['rec']):.4f} "
            f"latent={float(metrics['latent']):.4f} "
            f"({(len(x) // args.batch_size) / (time.time() - t0):.1f} steps/s)"
        )

    tree["params_E"] = state.params_E  # save_checkpoint fetches device arrays in chunks

    class _S:
        params_E = tree["params_E"]
        params_G = tree["params_G"]
        vars_D = tree["vars_D"]
        opt_eg = tree["opt_eg"]
        opt_d = tree["opt_d"]
        step = tree["step"]

    out = f"audio-mnist-bigan-finetuned-{args.metric}.tar"
    save_audio_bigan(out, _S, stats_ckpt, data, meta={"finetuned": args.metric})
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
