"""Encoder-only fine-tuning for the whale-call BiGAN (successor of
``finetune_whale_bigan.py:50-80``)."""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--nocall-dir", type=str, default=None)
parser.add_argument("--shotgun-dir", type=str, default=None)
parser.add_argument("--upcall-dir", type=str, default=None)
parser.add_argument("--synthetic-clips", type=int, default=32,
                    help="per-class clip count for the synthetic stand-in "
                    "(ignored when real data dirs are given)")
parser.add_argument("--model-file", type=str, default="whale-bigan.tar")
parser.add_argument("--steps", type=int, default=20, help="epochs")
parser.add_argument("--metric", type=str, default="mse", choices=["mse", "ssim"])
parser.add_argument("--lr", type=float, default=1e-5)
parser.add_argument("--batch-size", type=int, default=32)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling

    from imagecfgen_tpu.cf.finetune import EncoderFinetuner, FinetuneConfig
    from imagecfgen_tpu.cli.whale_common import (
        collect_whale_arrays,
        load_whale_bigan,
        load_whale_dataset,
        save_whale_bigan,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, whale_bigan_config

    data = load_whale_dataset(args.nocall_dir, args.shotgun_dir, args.upcall_dir,
                              synthetic_clips=args.synthetic_clips)
    x, calls, _ = collect_whale_arrays(data, "train")
    tree, stats, _meta = load_whale_bigan(args.model_file)

    model = BiGAN(whale_bigan_config(d=_meta.get("d", 64)))
    ft = EncoderFinetuner(
        model, tree["params_G"],
        FinetuneConfig(learning_rate=args.lr, batch_size=args.batch_size, metric=args.metric),
    )
    state = ft.init_state(tree["params_E"], jax.random.PRNGKey(args.seed))
    device_data = ft.upload_dataset(x, {"call_type": calls})
    key = jax.random.PRNGKey(args.seed + 1)

    for epoch in range(args.steps):
        t0 = time.time()
        state, metrics = ft.fit_epoch(state, device_data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        print(
            f"epoch {epoch + 1}/{args.steps}: {args.metric}={float(metrics['rec']):.4f} "
            f"latent={float(metrics['latent']):.4f}"
        )

    tree["params_E"] = state.params_E  # save_checkpoint fetches device arrays in chunks

    class _S:
        params_E = tree["params_E"]
        params_G = tree["params_G"]
        vars_D = tree["vars_D"]
        opt_eg = tree["opt_eg"]
        opt_d = tree["opt_d"]
        step = tree["step"]

    out = f"whale-bigan-finetuned-{args.metric}.tar"
    save_whale_bigan(out, _S, stats, meta={"finetuned": args.metric})
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
