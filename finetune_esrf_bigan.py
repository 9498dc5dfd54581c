"""Encoder-only fine-tuning for the ESRF 512^2 acoustic BiGAN.

The reference has no ESRF fine-tune script — it warm-starts this family
from a previous checkpoint instead (``image_scms/esrf_acoustic.py:280-284``)
— but its whale pipeline fine-tunes the encoder for exactly the symptom
the ESRF battery shows (poor E->G reconstruction making counterfactuals
non-surgical, ``finetune_whale_bigan.py:50-80``). This mirrors that recipe:
freeze G, Adam(1e-5) on E, loss = reconstruction (MSE or 1-SSIM) +
mean(z^2), over the same training windows as ``train_esrf_bigan.py``.
"""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--wav-dir", "--data-dir", type=str, default=None)
parser.add_argument("--label-csv", "--labels", type=str, default=None)
parser.add_argument("--synthetic-recordings", type=int, default=24,
                    help="recording count for the synthetic stand-in "
                         "(must match the training run's)")
parser.add_argument("--model-file", type=str, default="esrf-bigan.tar")
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--steps", type=int, default=20, help="epochs")
parser.add_argument("--metric", type=str, default="ssim", choices=["mse", "ssim"])
parser.add_argument("--lr", type=float, default=1e-5)
parser.add_argument("--batch-size", type=int, default=16)
parser.add_argument("--max-batches", type=int, default=None)
parser.add_argument("--remat", action="store_true", default=True)
parser.add_argument("--no-remat", dest="remat", action="store_false")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cf.finetune import EncoderFinetuner, FinetuneConfig
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from imagecfgen_tpu.data.esrf import EsrfStation
    from imagecfgen_tpu.models.bigan import BiGAN, esrf_bigan_config
    from imagecfgen_tpu.ops.spectral import SpectStats
    from imagecfgen_tpu.utils import profiling

    if args.wav_dir and os.path.isdir(args.wav_dir):
        data = EsrfStation(args.wav_dir, args.label_csv)
    else:
        if args.wav_dir:
            print(f"warning: {args.wav_dir} not found; using the synthetic ESRF stand-in")
        data = EsrfStation(synthetic_recordings=args.synthetic_recordings)

    tree, meta = load_checkpoint(args.model_file)
    # normalise with the TRAINING run's stats (carried in the checkpoint),
    # not fresh ones — E was trained against these
    stats = SpectStats(jnp.asarray(tree["spect_mean"]), jnp.asarray(tree["spect_std"]))

    spects, boats, dists = [], [], []
    for i, batch in enumerate(data.stream(batch_size=32, mode="train")):
        spects.append(batch["audio"])
        boats.append(batch["has_boat"])
        dists.append(batch["closest_boat"])
        if args.max_batches and i + 1 >= args.max_batches:
            break
    spects = np.concatenate(spects, axis=0)
    x = np.asarray(stats.spect_to_img(jnp.asarray(spects)))[..., None].astype(np.float32)
    attrs = {
        "has_boat": np.concatenate(boats, axis=0).astype(np.float32),
        "closest_boat": np.concatenate(dists, axis=0).astype(np.float32),
    }
    print(f"fine-tuning on {len(x)} 512x512 windows")

    model = BiGAN(esrf_bigan_config(d=meta.get("d", 64)))
    ft = EncoderFinetuner(
        model, tree["params_G"],
        FinetuneConfig(learning_rate=args.lr, batch_size=args.batch_size,
                       metric=args.metric, remat=args.remat),
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
            f"latent={float(metrics['latent']):.4f} ({time.time() - t0:.1f}s)",
            flush=True,
        )

    os.makedirs(args.output_path or ".", exist_ok=True)
    out = os.path.join(args.output_path or ".",
                       f"esrf-bigan-finetuned-{args.metric}.tar")
    # scoring (tools/esrf_quality.py) needs only E/G + stats; dropping the
    # optimizer states keeps the device fetch + 1-core serialize of this
    # 512^2 family's checkpoint to ~1/4 of the full train state's cost
    save_checkpoint(
        out,
        {
            "params_E": state.params_E,
            "params_G": tree["params_G"],
            "spect_mean": np.asarray(stats.mean),
            "spect_std": np.asarray(stats.std),
        },
        meta={"kind": "bigan-esrf", "d": meta.get("d", 64),
              "finetuned": args.metric},
    )
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
