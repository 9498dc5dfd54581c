"""Generate do(thickness + 2) counterfactual images (demo figure).

Successor of the reference ``mnist_gan_counterfactuals.py:62-93``:
side-by-side original vs BiGAN counterfactual (and VAE baseline when
``mnist-vae.tar`` is present), the whole abduct-act-predict chain running
as one jitted program.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="", help="dir with *.tar artifacts")
parser.add_argument("--n-images", type=int, default=8)
parser.add_argument("--attr", type=str, default="thickness")
parser.add_argument("--delta", type=float, default=2.0)
parser.add_argument("--output", type=str, default="mnist-gan-counterfactuals.png")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cf.engine import CounterfactualEngine
    from imagecfgen_tpu.cli.common import (
        load_attribute_scm,
        load_bigan,
        load_mnist_training_data,
        save_grid_png,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    n = args.n_images
    xb = jnp.asarray(x[:n])
    ab = {k: jnp.asarray(np.asarray(v)[:n]) for k, v in attrs.items()}

    tree, scaler, _ = load_bigan(os.path.join(args.model_dir, "mnist-bigan.tar"))
    scm = load_attribute_scm(os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    model = BiGAN(mnist_bigan_config())
    engine = CounterfactualEngine(model, tree["params_E"], tree["params_G"], scm, scaler)

    iv = {args.attr: ab[args.attr].reshape((-1, 1)) + args.delta}
    x_cf, cf_attrs = engine.counterfactual(jax.random.PRNGKey(args.seed), xb, ab, iv)
    recon = engine.reconstruct(xb, ab)

    rows = [np.asarray(xb).reshape(n, 28, 28),
            np.asarray(recon).reshape(n, 28, 28),
            np.asarray(x_cf).reshape(n, 28, 28)]
    labels = ["x", "G(E(x,c),c)", f"do({args.attr}+{args.delta:g})"]
    save_grid_png(args.output, rows, labels, title=f"do({args.attr} + {args.delta:g})")
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
