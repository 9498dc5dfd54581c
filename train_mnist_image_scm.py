"""Train the MNIST conditional BiGAN image SCM.

Drop-in successor of the reference ``train_mnist_image_scm.py``: same flags
(``--data-dir --steps --output-path``, plus ``--batch-size`` /
``--d-updates-per-g-update``), same artifact name ``mnist-bigan.tar``.
Unlike the reference (checkpoint only at the very end,
``train_mnist_image_scm.py:61-67``), checkpoints are written every
``--checkpoint-every`` epochs so runs resume.
"""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--steps", type=int, default=200, help="training epochs")
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--batch-size", type=int, default=64)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--d-updates-per-g-update", type=int, default=3)
parser.add_argument("--save-images-every", type=int, default=2)
parser.add_argument("--checkpoint-every", type=int, default=10)
parser.add_argument("--resume", action="store_true")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--throughput", action="store_true",
                    help="opt-in speed mode: fused D steps + fused EG-phase D "
                         "forwards + bf16 Adam first moment (+28-32%% steps/s on "
                         "the MNIST config, docs/PERF.md). Changes training "
                         "semantics: measured cost ~5 points of compound-CF "
                         "digit accuracy on the hard battery (RESULTS.md "
                         "'FUSED throughput mode'); default keeps exact "
                         "reference numerics")

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
    import numpy as np

    from imagecfgen_tpu.cli.common import (
        load_bigan,
        load_mnist_training_data,
        save_bigan,
        save_grid_png,
        scale_attrs_np,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    x, attrs, scaler = load_mnist_training_data(args.data_dir, "train")
    a_scaled = scale_attrs_np(scaler, attrs)

    model = BiGAN(mnist_bigan_config())
    trainer = GANTrainer(
        model,
        GANTrainConfig(
            learning_rate=args.l_rate,
            batch_size=args.batch_size,
            d_updates_per_g_update=args.d_updates_per_g_update,
            **_throughput_kw(args),
        ),
    )
    ckpt_path = os.path.join(args.output_path or ".", "mnist-bigan.tar")
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    start_epoch = 0
    if args.resume and os.path.exists(ckpt_path):
        from imagecfgen_tpu.core.checkpoint import load_checkpoint

        from imagecfgen_tpu.core.checkpoint import load_resume

        template = {
            "params_E": state.params_E, "params_G": state.params_G,
            "vars_D": state.vars_D, "opt_eg": state.opt_eg, "opt_d": state.opt_d,
            "step": state.step, "scaler": scaler.state_dict(),
        }
        tree, meta = load_resume(ckpt_path, template, rng_template=state.rng)
        state = state.replace(
            params_E=tree["params_E"], params_G=tree["params_G"],
            vars_D=tree["vars_D"], opt_eg=tree["opt_eg"], opt_d=tree["opt_d"],
            step=tree["step"],
            **({"rng": tree["rng"]} if "rng" in tree else {}),
        )
        start_epoch = meta.get("epoch", 0)
        print(f"resumed from {ckpt_path} at epoch {start_epoch}")

    data = trainer.upload_dataset(x, a_scaled)
    key = jax.random.PRNGKey(args.seed + 1)

    # held-out demo rows for the per-epoch sample grid
    n_show = 10
    x_demo = data["image"][:n_show]
    a_demo = {k: v[:n_show] for k, v in data["attrs"].items()}

    os.makedirs(args.output_path or ".", exist_ok=True)
    for epoch in range(start_epoch, args.steps):
        t0 = time.time()
        state, metrics = trainer.fit_epoch(state, data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        dt = time.time() - t0
        n_steps = len(x) // args.batch_size
        print(
            f"epoch {epoch + 1}/{args.steps}: "
            f"D(G(z))={float(metrics['D_score']):.4f} "
            f"D(E(x))={float(metrics['EG_score']):.4f} "
            f"({n_steps / dt:.1f} steps/s)"
        )

        if args.save_images_every and (epoch + 1) % args.save_images_every == 0:
            import jax.numpy as jnp

            z = jax.random.normal(jax.random.fold_in(key, 10_000 + epoch), (n_show, 1, 1, 512))
            gener = np.asarray(trainer.generate(state, z, a_demo)).reshape(n_show, 28, 28)
            codes = trainer.encode(state, x_demo, a_demo)
            recon = np.asarray(trainer.generate(state, codes, a_demo)).reshape(n_show, 28, 28)
            real = np.asarray(x_demo).reshape(n_show, 28, 28)
            save_grid_png(
                os.path.join(args.output_path or ".", f"epoch-{epoch + 1}.png"),
                [gener, real, recon],
                ["G(z, c)", "x", "G(E(x, c), c)"],
                title=f"Epoch {epoch + 1}",
            )

        if (epoch + 1) % args.checkpoint_every == 0 or (epoch + 1) == args.steps:
            save_bigan(ckpt_path, state, scaler, meta={"epoch": epoch + 1})

    print(f"saved {ckpt_path}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
