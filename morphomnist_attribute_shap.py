"""Attribute attributions for the generative classifiers: expected-gradients
(GradientExplainer-style) SHAP values of the classifier's class scores with
respect to the conditioning attributes, marginalised over latent z.

Successor of ``morphomnist_attribute_shap.py:69-130``. The reference uses
``shap.GradientExplainer``; this environment has no shap package, so the
same estimator is implemented natively: expected gradients with background
interpolation (integrated-gradients samples over background points), which
is exactly what GradientExplainer computes. Outputs the same
``{bigan,vae}_attribute_shap.npy`` artifacts of shape (N, 10, 3).
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="mnist-data")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--bigan", type=str, default="mnist-bigan.tar")
parser.add_argument("--limit", "--samples", type=int, default=4)
parser.add_argument("--n-background", type=int, default=64)
parser.add_argument("--n-mc", type=int, default=8, help="z samples per eval")
parser.add_argument("--n-steps", type=int, default=16, help="interpolation samples")
parser.add_argument("--seed", type=int, default=42)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.common import (
        load_bigan,
        load_mnist_training_data,
        scale_attrs_np,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.attributes import pack_mnist_attrs
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, scaler = load_mnist_training_data(args.data_dir, split)
    a_scaled = scale_attrs_np(scaler, attrs)
    packed = pack_mnist_attrs(a_scaled).astype(np.float32)  # (N, 13)

    tree, _, _ = load_bigan(os.path.join(args.model_dir, args.bigan))
    clf_tree, _ = load_checkpoint(os.path.join(args.model_dir, "mnist_clf.tar"))
    model = BiGAN(mnist_bigan_config())
    clf = CNNClassifier(mnist_classifier_config())

    generators = {"bigan": lambda z, a: model.generator.apply({"params": tree["params_G"]}, z, a)}
    vae_path = os.path.join(args.model_dir, "mnist-vae.tar")
    if os.path.exists(vae_path):
        from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config

        vtree, _ = load_checkpoint(vae_path)
        vmodel = ConditionalVAE(mnist_vae_config())
        generators["vae"] = lambda z, a: vmodel.decoder.apply(
            {"params": vtree["params"]["decoder"]}, z, a
        )

    def unpack(a13):
        return {
            "digit": a13[:, :10],
            "thickness": a13[:, 10],
            "intensity": a13[:, 11],
            "slant": a13[:, 12],
        }

    rng = np.random.default_rng(args.seed)
    bg = jnp.asarray(packed[rng.permutation(len(packed))[: args.n_background]])

    for name, gen in generators.items():

        def class_probs(a13, key):
            """mean_z softmax(clf(G(z, a))) — (B, 10)."""
            a = unpack(a13)
            b = a13.shape[0]
            def one(k):
                z = jax.random.normal(k, (b, 1, 1, 512))
                img = gen(z, a)
                return jax.nn.softmax(clf.apply({"params": clf_tree["params"]}, img), axis=1)
            keys = jax.random.split(key, args.n_mc)
            return jax.vmap(one)(keys).mean(axis=0)

        @jax.jit
        def expected_gradients(a13, key):
            """SHAP via expected gradients: E_{b, t}[ (a - b) * dF/da |_{b + t(a-b)} ]."""
            k1, k2, k3 = jax.random.split(key, 3)
            bidx = jax.random.randint(k1, (args.n_steps,), 0, bg.shape[0])
            ts = jax.random.uniform(k2, (args.n_steps,))

            def one(b_i, t, k):
                base = bg[b_i][None]
                point = base + t * (a13 - base)
                grad = jax.jacrev(lambda a: class_probs(a, k).sum(axis=0))(point)
                # grad: (10, 1, 13)
                return grad[:, 0, :] * (a13 - base)[0]

            contribs = jax.vmap(one)(bidx, ts, jax.random.split(k3, args.n_steps))
            return contribs.mean(axis=0)  # (10, 13)

        n = min(args.limit, len(packed))
        out = np.zeros((n, 10, 3))
        key = jax.random.PRNGKey(args.seed)
        for i in range(n):
            key, k = jax.random.split(key)
            sv = expected_gradients(jnp.asarray(packed[i : i + 1]), k)
            out[i] = np.asarray(sv)[:, [10, 11, 12]]
        np.save(f"{name}_attribute_shap.npy", out)
        print(f"saved {name}_attribute_shap.npy "
              f"(mean |shap|: {np.abs(out).mean(axis=(0, 1)).round(4)})")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
