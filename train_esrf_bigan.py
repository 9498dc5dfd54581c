"""Train the 512^2 ESRF acoustic BiGAN (successor of
``train_esrf_bigan.py:17-35`` / ``image_scms/esrf_acoustic.py:263-447``),
with ``--start-model`` warm start like the reference.
"""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--wav-dir", "--data-dir", type=str, default=None)
parser.add_argument("--label-csv", "--labels", type=str, default=None)
parser.add_argument("--steps", "--epochs", type=int, default=500, help="epochs")
parser.add_argument("--batch-size", type=int, default=16)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--checkpoint-every", type=int, default=5)
parser.add_argument("--start-model", type=str, default=None)
parser.add_argument("--d", type=int, default=64)
parser.add_argument("--max-batches", type=int, default=None,
                    help="cap data collection (512^2 windows are large)")
parser.add_argument("--remat", action="store_true", default=True,
                    help="rematerialize forwards in backward (saves HBM on the large spectrogram stacks)")
parser.add_argument("--no-remat", dest="remat", action="store_false")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--init-std", type=float, default=None,
                    help="override the conv init std (reference: 0.001, "
                         "esrf_acoustic.py:24-27, which spends ~20k steps "
                         "with all D logits ~0 before learning starts; "
                         "0.01 escapes within one epoch — documented deviation)")
parser.add_argument("--synthetic-recordings", type=int, default=24,
                    help="recording count for the synthetic stand-in "
                         "(used when --wav-dir is absent); each boat-positive "
                         "recording yields 10 windows, negatives yield 1")
parser.add_argument("--resume", action="store_true",
                    help="continue from an existing esrf-bigan.tar in --output-path")

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from imagecfgen_tpu.data.esrf import EsrfStation
    from imagecfgen_tpu.models.bigan import BiGAN, esrf_bigan_config
    from imagecfgen_tpu.ops.spectral import SpectStats
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    if args.wav_dir and os.path.isdir(args.wav_dir):
        data = EsrfStation(args.wav_dir, args.label_csv)
    else:
        if args.wav_dir:
            print(f"warning: {args.wav_dir} not found; using the synthetic ESRF stand-in")
        data = EsrfStation(synthetic_recordings=args.synthetic_recordings)

    spects, boats, dists = [], [], []
    for i, batch in enumerate(data.stream(batch_size=32, mode="train")):
        spects.append(batch["audio"])
        boats.append(batch["has_boat"])
        dists.append(batch["closest_boat"])
        if args.max_batches and i + 1 >= args.max_batches:
            break
    spects = np.concatenate(spects, axis=0)
    stats = SpectStats.compute(jnp.asarray(spects))
    x = np.asarray(stats.spect_to_img(jnp.asarray(spects)))[..., None].astype(np.float32)
    attrs = {
        "has_boat": np.concatenate(boats, axis=0).astype(np.float32),
        "closest_boat": np.concatenate(dists, axis=0).astype(np.float32),
    }
    print(f"training on {len(x)} 512x512 windows")

    cfg = esrf_bigan_config(d=args.d)
    if args.init_std is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, init_std=args.init_std)
    model = BiGAN(cfg)
    trainer = GANTrainer(
        model,
        GANTrainConfig(learning_rate=args.l_rate, betas=(0.5, 0.9),
                       batch_size=args.batch_size, remat=args.remat),
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    if args.start_model:
        tree, _ = load_checkpoint(args.start_model)
        state = state.replace(
            params_E=tree["params_E"], params_G=tree["params_G"], vars_D=tree["vars_D"]
        )
        print(f"warm-started from {args.start_model}")

    out = os.path.join(args.output_path or ".", "esrf-bigan.tar")
    start_epoch = 0
    if args.resume and os.path.exists(out):
        from imagecfgen_tpu.core.checkpoint import load_resume

        template = {
            "params_E": state.params_E, "params_G": state.params_G,
            "vars_D": state.vars_D, "opt_eg": state.opt_eg,
            "opt_d": state.opt_d, "step": state.step,
            "spect_mean": np.asarray(stats.mean),
            "spect_std": np.asarray(stats.std),
        }
        tree, meta = load_resume(out, template, rng_template=state.rng)
        state = state.replace(
            params_E=tree["params_E"], params_G=tree["params_G"],
            vars_D=tree["vars_D"], opt_eg=tree["opt_eg"], opt_d=tree["opt_d"],
            step=tree["step"],
            **({"rng": tree["rng"]} if "rng" in tree else {}),
        )
        start_epoch = int(meta.get("epoch", 0))
        print(f"resumed from {out} at epoch {start_epoch}")

    device_data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(args.seed + 1)
    os.makedirs(args.output_path or ".", exist_ok=True)
    nb = max(len(x) // args.batch_size, 1)
    for epoch in range(start_epoch, args.steps):
        t0 = time.time()
        state, metrics = trainer.fit_epoch(state, device_data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        print(
            f"epoch {epoch + 1}/{args.steps}: D(G(z))={float(metrics['D_score']):.4f} "
            f"D(E(x))={float(metrics['EG_score']):.4f} "
            f"({nb / (time.time() - t0):.1f} steps/s)"
        )
        if (epoch + 1) % args.checkpoint_every == 0 or (epoch + 1) == args.steps:
            st = state  # save_checkpoint fetches device arrays in chunks
            save_checkpoint(
                out,
                {
                    "params_E": st.params_E, "params_G": st.params_G,
                    "vars_D": st.vars_D, "opt_eg": st.opt_eg, "opt_d": st.opt_d,
                    "step": st.step,
                    "rng": st.rng,
                    "spect_mean": np.asarray(stats.mean),
                    "spect_std": np.asarray(stats.std),
                },
                meta={"kind": "bigan-esrf", "epoch": epoch + 1, "d": args.d,
                      "carries_rng": True},
            )
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    clean_exit()
