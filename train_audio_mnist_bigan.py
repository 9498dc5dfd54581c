"""Train the AudioMNIST spectrogram BiGAN.

The reference exposes this only as ``image_scms.audio_mnist.train()``
(``image_scms/audio_mnist.py:321-482``; no dedicated script — checkpoints
like ``audio-mnist-retrain.tar`` are referenced by the eval scripts). Same
semantics here with an explicit entry point: spectrogram-stats pass, the
clip(+-3 std)/3 normalisation, Adam(0.5, 0.9), VALIDATION_RUNS held out —
but spectrograms are computed once on device and the whole epoch is one
jitted scan.
"""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--zip-path", type=str, default=None,
                    help="AudioMNIST zip; synthetic stand-in when absent")
parser.add_argument("--steps", type=int, default=200, help="epochs")
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--checkpoint-every", type=int, default=10)
parser.add_argument("--d", type=int, default=64, help="channel multiplier")
parser.add_argument("--init-std", type=float, default=None,
                    help="conv init std override. The reference's 0.001 "
                         "(image_scms/audio_mnist.py:33-38) is the default; "
                         "with no batch-norm in the audio D the game spends "
                         "many thousand steps at D(..)=0.5 before activations "
                         "grow out of the near-zero init ('incubation'); "
                         "0.01 escapes immediately")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--throughput", action="store_true",
                    help="opt-in speed mode: fused D steps + fused EG-phase D "
                         "forwards + bf16 Adam first moment (+28-32%% steps/s on "
                         "the MNIST config, docs/PERF.md). Changes training "
                         "semantics: measured cost ~5 points of compound-CF "
                         "digit accuracy on the MNIST hard battery (RESULTS.md "
                         "'FUSED throughput mode'); default keeps exact "
                         "reference numerics")
parser.add_argument("--compute-dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="activation/matmul dtype for the E/G/D forwards "
                         "(params and optimizer state stay float32). "
                         "bfloat16 is +18%% steps/s on this family "
                         "(docs/PERF.md) and quality-neutral at budget "
                         "(RESULTS.md bf16 battery: CF 0.9833 vs f32 "
                         "0.9767); float32 keeps exact reference numerics")
parser.add_argument("--resume", action="store_true",
                    help="continue from an existing audio-mnist-bigan.tar in --output-path")

def _throughput_kw(args):
    """--throughput -> the opt-in GANTrainConfig speed flags (docs/PERF.md)."""
    if not getattr(args, "throughput", False):
        return {}
    import jax.numpy as jnp

    return dict(fused_d_steps=True, fused_eg_d=True, mu_dtype=jnp.bfloat16)


if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling

    from imagecfgen_tpu.cli.audio_common import (
        load_audio_dataset,
        prepare_training_arrays,
        save_audio_bigan,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    data = load_audio_dataset(args.zip_path)
    x, attrs, stats = prepare_training_arrays(data)
    print(f"training on {len(x)} spectrograms")

    cfg = audio_mnist_bigan_config(d=args.d)
    import dataclasses

    if args.init_std is not None:
        cfg = dataclasses.replace(cfg, init_std=args.init_std)
    if args.compute_dtype != "float32":
        import jax.numpy as jnp

        cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    model = BiGAN(cfg)
    trainer = GANTrainer(
        model,
        GANTrainConfig(
            learning_rate=args.l_rate, betas=(0.5, 0.9),
            batch_size=args.batch_size, d_updates_per_g_update=1,
            **_throughput_kw(args),
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    out = os.path.join(args.output_path or ".", "audio-mnist-bigan.tar")
    start_epoch = 0
    if args.resume and os.path.exists(out):
        import numpy as np

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
    nb = len(x) // args.batch_size
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
            # no monolithic device_get here: save_checkpoint fetches the
            # multi-GB state in chunks with progress lines (tunnel gotcha)
            save_audio_bigan(out, state, stats, data,
                             meta={"epoch": epoch + 1, "d": args.d})
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
