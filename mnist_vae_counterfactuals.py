"""Pixel-level CF fidelity vs the ground-truth SCM: re-perturb the source
digits with the morphometry pipeline under the intervened attributes and
report pixel MAE between model counterfactuals and ground-truth CF images.

Successor of ``mnist_vae_counterfactuals.py:122-178`` (which crashes on
main: it calls ``MorphoMNISTVAE(latent_dim=...)`` against a
``__init__(self, device)`` signature — SURVEY §4). Scores the VAE and/or
the BiGAN engine depending on which checkpoints exist.
"""
from argparse import ArgumentParser
import multiprocessing
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-model-file", type=str, default=None,
                    help="VAE checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attr-model-file", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--latent-dim", type=int, default=None,
                    help="accepted for reference CLI compatibility; the VAE "
                         "latent dim is fixed by the architecture/checkpoint "
                         "(the reference's own flag crashes its script: "
                         "MorphoMNISTVAE takes no latent_dim)")
parser.add_argument("--attr", type=str, default="thickness")
parser.add_argument("--delta", type=float, default=2.0)
parser.add_argument("--limit", type=int, default=64)
parser.add_argument("--scale", type=int, default=16)
parser.add_argument("--workers", type=int, default=max(os.cpu_count() - 1, 1))
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.common import (
        load_attribute_scm,
        load_bigan,
        load_mnist_training_data,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.data.morphomnist_synth import perturb_image
    from imagecfgen_tpu.metrics.measured import images_to_255

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    n = min(args.limit, len(x))
    xb = jnp.asarray(x[:n])
    ab = {k: jnp.asarray(np.asarray(v)[:n]) for k, v in attrs.items()}
    x255 = images_to_255(np.asarray(xb))

    # ground-truth CF images: re-perturb the observed digits with the
    # intervened attribute through the morphology pipeline
    t = np.asarray(attrs["thickness"][:n], np.float64)
    i_ = np.asarray(attrs["intensity"][:n], np.float64)
    s = np.asarray(attrs["slant"][:n], np.float64)
    targets = {"thickness": t.copy(), "intensity": i_.copy(), "slant": s.copy()}
    targets[args.attr] = targets[args.attr] + args.delta

    def gt_job(k):
        return perturb_image(
            x255[k] / 255.0, targets["thickness"][k], targets["intensity"][k],
            targets["slant"][k], scale=args.scale,
        )

    pool = multiprocessing.Pool(args.workers) if args.workers > 1 else None
    gen = pool.map(gt_job, range(n)) if pool else [gt_job(k) for k in range(n)]
    if pool:
        pool.close()
    gt_cf = np.stack(gen, axis=0)

    iv = {args.attr: jnp.asarray(targets[args.attr].reshape(-1, 1).astype(np.float32))}
    results = {}

    bigan_path = os.path.join(args.model_dir, "mnist-bigan.tar")
    if os.path.exists(bigan_path):
        from imagecfgen_tpu.cf.engine import CounterfactualEngine
        from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config

        tree, scaler, _ = load_bigan(bigan_path)
        scm = load_attribute_scm(args.attr_model_file or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
        engine = CounterfactualEngine(
            BiGAN(mnist_bigan_config()), tree["params_E"], tree["params_G"], scm, scaler
        )
        x_cf, _ = engine.counterfactual(jax.random.PRNGKey(args.seed), xb, ab, iv)
        results["bigan"] = float(np.abs(images_to_255(np.asarray(x_cf)) - gt_cf).mean())

    vae_path = args.image_model_file or os.path.join(args.model_dir, "mnist-vae.tar")
    if os.path.exists(vae_path):
        from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config

        vtree, _ = load_checkpoint(vae_path)
        scaler = AttributeScaler.from_state_dict(MNIST_SPEC, vtree["scaler"])
        scm = load_attribute_scm(args.attr_model_file or os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
        model = ConditionalVAE(mnist_vae_config())
        obs = {
            "thickness": ab["thickness"].reshape((-1, 1)),
            "intensity": ab["intensity"].reshape((-1, 1)),
            "slant": ab["slant"].reshape((-1, 1)),
            "digit": jnp.argmax(ab["digit"], axis=1),
        }
        cf_obs = scm.sample_cf(jax.random.PRNGKey(args.seed), obs, {args.attr: iv[args.attr]})
        cf_ab = {
            "digit": ab["digit"],
            "thickness": cf_obs["thickness"].reshape((-1,)),
            "intensity": cf_obs["intensity"].reshape((-1,)),
            "slant": cf_obs["slant"].reshape((-1,)),
        }
        mean, _ = model.encoder.apply({"params": vtree["params"]["encoder"]}, xb, scaler.scale(dict(ab)))
        x_cf = model.decoder.apply({"params": vtree["params"]["decoder"]}, mean, scaler.scale(cf_ab))
        results["vae"] = float(np.abs(images_to_255(np.asarray(x_cf)) - gt_cf).mean())

    for name, mae in results.items():
        print(f"{name}: pixel MAE vs ground-truth do({args.attr}+{args.delta:g}) = {mae:.3f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
