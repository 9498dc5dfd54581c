"""Train the unconditional AudioMNIST spectrogram GAN / WGAN-GP.

Successor of ``gans/audio_mnist.py:227-330`` (the reference module is an
orphan whose local data loader is broken on main — SURVEY §2.4; the
capability is rebuilt against the shared AudioMNIST pipeline).
"""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--zip-path", type=str, default=None)
parser.add_argument("--steps", type=int, default=200, help="epochs")
parser.add_argument("--batch-size", type=int, default=64)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--loss-mode", type=str, default="gan", choices=["gan", "wgan"])
parser.add_argument("--d-updates-per-g-update", type=int, default=1)
parser.add_argument("--discriminator-weight-decay", type=float, default=0.0)
parser.add_argument("--generator-size", type=int, default=64)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--checkpoint-every", type=int, default=10)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--resume", action="store_true",
                    help="continue from an existing artifact in --output-path")

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling
    import numpy as np

    from imagecfgen_tpu.cli.audio_common import load_audio_dataset, prepare_training_arrays
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.models.gan import UncondGANConfig
    from imagecfgen_tpu.train.uncond_gan_trainer import (
        UncondGANTrainConfig,
        UncondGANTrainer,
    )

    data = load_audio_dataset(args.zip_path)
    x, _, stats = prepare_training_arrays(data)

    cfg = UncondGANConfig(d=args.generator_size)
    trainer = UncondGANTrainer(
        cfg,
        UncondGANTrainConfig(
            learning_rate=args.l_rate, batch_size=args.batch_size,
            d_updates_per_g_update=args.d_updates_per_g_update,
            loss_mode=args.loss_mode,
            discriminator_weight_decay=args.discriminator_weight_decay,
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    out = os.path.join(args.output_path or ".", f"audio-gan-{args.loss_mode}.tar")
    start_epoch = 0
    if args.resume and os.path.exists(out):
        from imagecfgen_tpu.core.checkpoint import load_resume

        template = {
            "params_G": state.params_G, "params_D": state.params_D,
            "opt_g": state.opt_g, "opt_d": state.opt_d, "step": state.step,
            "spect_mean": np.asarray(stats.mean),
            "spect_std": np.asarray(stats.std),
        }
        tree, meta = load_resume(out, template, rng_template=state.rng)
        state = state.replace(
            params_G=tree["params_G"], params_D=tree["params_D"],
            opt_g=tree["opt_g"], opt_d=tree["opt_d"], step=tree["step"],
            **({"rng": tree["rng"]} if "rng" in tree else {}),
        )
        start_epoch = int(meta.get("epoch", 0))
        print(f"resumed from {out} at epoch {start_epoch}")

    device_data = trainer.upload_dataset(x)
    key = jax.random.PRNGKey(args.seed + 1)
    os.makedirs(args.output_path or ".", exist_ok=True)
    nb = max(len(x) // args.batch_size, 1)
    for epoch in range(start_epoch, args.steps):
        t0 = time.time()
        state, metrics = trainer.fit_epoch(state, device_data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        print(
            f"epoch {epoch + 1}/{args.steps}: loss_G={float(metrics['loss_G']):.4f} "
            f"loss_D={float(metrics['loss_D']):.4f} "
            f"({nb / (time.time() - t0):.1f} steps/s)"
        )
        if (epoch + 1) % args.checkpoint_every == 0 or (epoch + 1) == args.steps:
            st = state  # save_checkpoint fetches device arrays in chunks
            save_checkpoint(
                out,
                {
                    "params_G": st.params_G, "params_D": st.params_D,
                    "opt_g": st.opt_g, "opt_d": st.opt_d, "step": st.step,
                    "rng": st.rng,
                    "spect_mean": np.asarray(stats.mean),
                    "spect_std": np.asarray(stats.std),
                },
                meta={"kind": f"uncond-gan-{args.loss_mode}", "epoch": epoch + 1,
                      "carries_rng": True},
            )
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
