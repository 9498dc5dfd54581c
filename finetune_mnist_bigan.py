"""Encoder-only reconstruction fine-tuning of the MNIST BiGAN.

Successor of the reference ``finetune_mnist_bigan.py:60-90``: freeze G,
Adam(--lr) on E, loss = (MSE | 1-SSIM) + mean(z^2); writes
``mnist-bigan-finetuned-{metric}.tar``.
"""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--steps", type=int, default=20, help="epochs")
parser.add_argument("--model-file", type=str, default="mnist-bigan.tar")
parser.add_argument("--metric", type=str, default="mse", choices=["mse", "ssim"])
parser.add_argument("--lr", type=float, default=1e-5)
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling

    from imagecfgen_tpu.cf.finetune import EncoderFinetuner, FinetuneConfig
    from imagecfgen_tpu.cli.common import (
        load_bigan,
        load_mnist_training_data,
        save_bigan,
        scale_attrs_np,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config

    x, attrs, scaler = load_mnist_training_data(args.data_dir, "train")
    a_scaled = scale_attrs_np(scaler, attrs)

    tree, scaler_ckpt, meta = load_bigan(args.model_file)
    model = BiGAN(mnist_bigan_config())
    ft = EncoderFinetuner(
        model, tree["params_G"],
        FinetuneConfig(learning_rate=args.lr, batch_size=args.batch_size, metric=args.metric),
    )
    state = ft.init_state(tree["params_E"], jax.random.PRNGKey(args.seed))
    data = ft.upload_dataset(x, a_scaled)
    key = jax.random.PRNGKey(args.seed + 1)

    for epoch in range(args.steps):
        t0 = time.time()
        state, metrics = ft.fit_epoch(state, data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        print(
            f"epoch {epoch + 1}/{args.steps}: {args.metric}={float(metrics['rec']):.4f} "
            f"latent={float(metrics['latent']):.4f} "
            f"({(len(x) // args.batch_size) / (time.time() - t0):.1f} steps/s)"
        )

    tree["params_E"] = state.params_E  # save_checkpoint fetches device arrays in chunks

    class _S:  # adapter for save_bigan's attribute access
        params_E = tree["params_E"]
        params_G = tree["params_G"]
        vars_D = tree["vars_D"]
        opt_eg = tree["opt_eg"]
        opt_d = tree["opt_d"]
        step = tree["step"]

    out = f"mnist-bigan-finetuned-{args.metric}.tar"
    save_bigan(out, _S, scaler_ckpt, meta={"finetuned": args.metric})
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
