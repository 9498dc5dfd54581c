"""Thickness-sweep figure: one row of counterfactual images as
do(thickness = v) sweeps a grid (successor of ``display_thickness.py:34-50``).
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--n-points", type=int, default=8)
parser.add_argument("--image-index", type=int, default=0)
parser.add_argument("--output", type=str, default="display-thickness.png")
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
    tree, scaler, _ = load_bigan(os.path.join(args.model_dir, "mnist-bigan.tar"))
    scm = load_attribute_scm(os.path.join(args.model_dir, "mnist-attribute-scm.tar"))
    engine = CounterfactualEngine(
        BiGAN(mnist_bigan_config()), tree["params_E"], tree["params_G"], scm, scaler
    )

    p = args.n_points
    i = args.image_index
    sweep = np.linspace(
        float(scaler.mins["thickness"]), float(scaler.maxs["thickness"]), p
    ).astype(np.float32)
    xb = jnp.asarray(np.repeat(x[i : i + 1], p, axis=0))
    ab = {k: jnp.asarray(np.repeat(np.asarray(v)[i : i + 1], p, axis=0)) for k, v in attrs.items()}
    x_cf, _ = engine.counterfactual(
        jax.random.PRNGKey(args.seed), xb, ab, {"thickness": jnp.asarray(sweep.reshape(-1, 1))}
    )
    save_grid_png(
        args.output,
        [np.asarray(x_cf).reshape(p, 28, 28)],
        [f"do(thickness)"],
        title="thickness sweep " + " ".join(f"{v:.1f}" for v in sweep),
    )
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
