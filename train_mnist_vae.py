"""Train the DeepSCM conditional VAE baseline.

Successor of the reference ``train_mnist_vae.py`` (defaults per
``deepscm_vae/mnist.py:136-147``): Adam 1e-4, 4 MC samples per step,
kl_weight 10, saves ``mnist-vae.tar``.
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
parser.add_argument("--num-samples-per-step", type=int, default=4)
parser.add_argument("--kl-weight", type=float, default=10.0)
parser.add_argument("--checkpoint-every", type=int, default=10)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    from imagecfgen_tpu.utils import profiling
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagecfgen_tpu.cli.common import load_mnist_training_data, scale_attrs_np
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config
    from imagecfgen_tpu.parallel.mesh import DATA_AXIS
    from imagecfgen_tpu.train.vae_trainer import VAETrainConfig, VAETrainer

    x, attrs, scaler = load_mnist_training_data(args.data_dir, "train")
    a_scaled = scale_attrs_np(scaler, attrs)

    model = ConditionalVAE(mnist_vae_config())
    trainer = VAETrainer(
        model,
        VAETrainConfig(
            learning_rate=args.l_rate,
            batch_size=args.batch_size,
            num_samples_per_step=args.num_samples_per_step,
            kl_weight=args.kl_weight,
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    sh = NamedSharding(trainer.mesh, P(DATA_AXIS))
    data = jax.tree_util.tree_map(
        lambda v: jax.device_put(np.asarray(v), sh),
        {"image": x, "attrs": a_scaled},
    )

    nb = len(x) // args.batch_size
    n_use = nb * args.batch_size
    key = jax.random.PRNGKey(args.seed + 1)

    # epoch program with on-device shuffle (same pattern as the GAN trainer)
    def epoch_fn(state, data, k):
        perm = jax.random.permutation(k, data["image"].shape[0])[:n_use]
        batches = jax.tree_util.tree_map(
            lambda v: v[perm].reshape((nb, args.batch_size) + v.shape[1:]), data
        )
        state, metrics = jax.lax.scan(trainer.train_step, state, batches)
        return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

    repl = NamedSharding(trainer.mesh, P())
    epoch_jit = jax.jit(epoch_fn, in_shardings=(repl, sh, repl),
                        out_shardings=(repl, repl), donate_argnums=(0,))
    state = jax.device_put(state, repl)

    out = os.path.join(args.output_path or ".", "mnist-vae.tar")
    os.makedirs(args.output_path or ".", exist_ok=True)
    for epoch in range(args.steps):
        t0 = time.time()
        state, metrics = epoch_jit(state, data, jax.random.fold_in(key, epoch))
        profiling.sync(metrics)
        print(
            f"epoch {epoch + 1}/{args.steps}: -elbo={float(metrics['neg_elbo']):.2f} "
            f"({nb / (time.time() - t0):.1f} steps/s)"
        )
        if (epoch + 1) % args.checkpoint_every == 0 or (epoch + 1) == args.steps:
            save_checkpoint(
                out,
                {"params": state.params, "scaler": scaler.state_dict()},
                meta={"kind": "vae-mnist", "epoch": epoch + 1},
            )
    print(f"saved {out}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
