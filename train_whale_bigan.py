"""Train the 256^2 whale-call BiGAN (successor of
``image_scms.whalecalls.train`` / ``finetune_whale_bigan.py``'s base model;
supports ``--start-model`` warm start like the ESRF trainer)."""
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
parser.add_argument("--steps", type=int, default=200, help="epochs")
parser.add_argument("--batch-size", type=int, default=32)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--filter-length", type=int, default=None)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--checkpoint-every", type=int, default=10)
parser.add_argument("--start-model", type=str, default=None)
parser.add_argument("--d", type=int, default=64)
parser.add_argument("--init-std", type=float, default=None,
                    help="conv init std override; the reference's 0.001 "
                         "(image_scms/whalecalls.py:23-26) is the default and "
                         "spends thousands of steps at D(..)=0.5 before "
                         "activations grow out of the near-zero init; 0.01 "
                         "escapes immediately")
parser.add_argument("--remat", action="store_true", default=False,
                    help="rematerialize forwards in backward (saves HBM on the large spectrogram stacks)")
parser.add_argument("--no-remat", dest="remat", action="store_false")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--throughput", action="store_true",
                    help="opt-in speed mode: fused D steps + fused EG-phase D "
                         "forwards + bf16 Adam first moment (+28-32%% steps/s on "
                         "the MNIST config, docs/PERF.md). Slightly changes "
                         "training semantics; default keeps exact reference "
                         "numerics")
parser.add_argument("--resume", action="store_true",
                    help="continue from an existing whale-bigan.tar in --output-path")

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

    from imagecfgen_tpu.cli.whale_common import (
        collect_whale_arrays,
        load_whale_bigan,
        load_whale_dataset,
        save_whale_bigan,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, whale_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    data = load_whale_dataset(args.nocall_dir, args.shotgun_dir, args.upcall_dir,
                              filter_length=args.filter_length,
                              synthetic_clips=args.synthetic_clips)
    x, calls, stats = collect_whale_arrays(data, "train")
    attrs = {"call_type": calls}
    print(f"training on {len(x)} spectrogram windows")

    cfg = whale_bigan_config(d=args.d)
    if args.init_std is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, init_std=args.init_std)
    model = BiGAN(cfg)
    trainer = GANTrainer(
        model,
        GANTrainConfig(learning_rate=args.l_rate, betas=(0.5, 0.9),
                       batch_size=args.batch_size, remat=args.remat,
                       **_throughput_kw(args)),
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    if args.start_model:
        tree, stats, _ = load_whale_bigan(args.start_model)
        state = state.replace(
            params_E=tree["params_E"], params_G=tree["params_G"], vars_D=tree["vars_D"]
        )
        print(f"warm-started from {args.start_model}")

    out = os.path.join(args.output_path or ".", "whale-bigan.tar")
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
            # no monolithic device_get here: save_checkpoint fetches the
            # multi-GB state in chunks with progress lines (tunnel gotcha)
            save_whale_bigan(out, state, stats,
                             meta={"epoch": epoch + 1, "d": args.d})
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
