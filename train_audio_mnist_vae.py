"""Train the AudioMNIST conditional VAE (successor of
``deepscm_vae.audio_mnist.train`` — invoked via the package in the
reference; saves ``audio-mnist-vae.tar``)."""
from argparse import ArgumentParser
import os
import time

parser = ArgumentParser()
parser.add_argument("--zip-path", type=str, default=None)
parser.add_argument("--steps", type=int, default=200, help="epochs")
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--l-rate", type=float, default=1e-4)
parser.add_argument("--num-samples-per-step", type=int, default=4)
parser.add_argument("--kl-weight", type=float, default=1.0)
parser.add_argument("--output-path", type=str, default="")
parser.add_argument("--checkpoint-every", type=int, default=10)
parser.add_argument("--d", type=int, default=64)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--resume", action="store_true",
                    help="continue from an existing audio-mnist-vae.tar in --output-path")

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagecfgen_tpu.cli.audio_common import load_audio_dataset, prepare_training_arrays
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.models.vae import ConditionalVAE, audio_mnist_vae_config
    from imagecfgen_tpu.parallel.mesh import DATA_AXIS
    from imagecfgen_tpu.train.vae_trainer import VAETrainConfig, VAETrainer

    data = load_audio_dataset(args.zip_path)
    x, attrs, stats = prepare_training_arrays(data)

    model = ConditionalVAE(audio_mnist_vae_config(d=args.d))
    trainer = VAETrainer(
        model,
        VAETrainConfig(
            learning_rate=args.l_rate, batch_size=args.batch_size,
            num_samples_per_step=args.num_samples_per_step, kl_weight=args.kl_weight,
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    sh = NamedSharding(trainer.mesh, P(DATA_AXIS))
    device_data = jax.tree_util.tree_map(
        lambda v: jax.device_put(np.asarray(v), sh), {"image": x, "attrs": dict(attrs)}
    )
    nb = len(x) // args.batch_size
    n_use = nb * args.batch_size
    repl = NamedSharding(trainer.mesh, P())

    def epoch_fn(state, d, k):
        perm = jax.random.permutation(k, d["image"].shape[0])[:n_use]
        batches = jax.tree_util.tree_map(
            lambda v: v[perm].reshape((nb, args.batch_size) + v.shape[1:]), d
        )
        state, metrics = jax.lax.scan(trainer.train_step, state, batches)
        return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

    epoch_jit = jax.jit(epoch_fn, in_shardings=(repl, sh, repl),
                        out_shardings=(repl, repl), donate_argnums=(0,))
    state = jax.device_put(state, repl)
    key = jax.random.PRNGKey(args.seed + 1)

    out = os.path.join(args.output_path or ".", "audio-mnist-vae.tar")
    os.makedirs(args.output_path or ".", exist_ok=True)
    start_epoch = 0
    if args.resume and os.path.exists(out):
        from imagecfgen_tpu.core.checkpoint import load_meta, load_resume

        if load_meta(out).get("carries_rng"):
            template = {
                "params": state.params, "opt": state.opt, "step": state.step,
                "spect_mean": np.asarray(stats.mean),
                "spect_std": np.asarray(stats.std),
            }
            tree, meta = load_resume(out, template, rng_template=state.rng)
            state = jax.device_put(
                state.replace(
                    params=tree["params"], opt=tree["opt"],
                    step=tree["step"], rng=tree["rng"],
                ),
                repl,
            )
            start_epoch = int(meta.get("epoch", 0))
            print(f"resumed from {out} at epoch {start_epoch}")
        else:
            print(f"warning: {out} predates resumable VAE checkpoints; not resuming")
    for epoch in range(start_epoch, args.steps):
        t0 = time.time()
        state, metrics = epoch_jit(state, device_data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        print(
            f"epoch {epoch + 1}/{args.steps}: -elbo={float(metrics['neg_elbo']):.2f} "
            f"({nb / (time.time() - t0):.1f} steps/s)"
        )
        if (epoch + 1) % args.checkpoint_every == 0 or (epoch + 1) == args.steps:
            save_checkpoint(
                out,
                {
                    "params": state.params,
                    "opt": state.opt,
                    "step": state.step,
                    "rng": state.rng,
                    "spect_mean": np.asarray(stats.mean),
                    "spect_std": np.asarray(stats.std),
                },
                meta={"kind": "vae-audio-mnist", "epoch": epoch + 1,
                      "d": args.d, "carries_rng": True},
            )
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
