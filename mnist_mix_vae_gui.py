"""Interactive attribute-slider counterfactual explorer.

Successor of ``mnist_mix_vae_gui.py:71-199``: matplotlib sliders for
thickness / intensity / slant and a digit selector; every slider movement
re-solves the jitted ``graph.sample_cf`` + decode pass (near-instant on
TPU vs the reference's per-movement host recompute). With ``--headless``
it renders a static grid over slider positions instead (no display in CI).
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--image-index", type=int, default=0)
parser.add_argument("--original", type=int, default=None,
                    help="pick the first image of this digit (reference GUI "
                         "semantics) instead of --image-index, and enable the "
                         "digit-mix slider")
parser.add_argument("--target", type=int, default=8,
                    help="digit whose one-hot the mix slider morphs toward")
parser.add_argument("--headless", action="store_true")
parser.add_argument("--output", type=str, default="mnist-mix-gui.png")
parser.add_argument("--seed", type=int, default=42)

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

    digits = np.asarray(attrs["digit"]).argmax(axis=1)
    if args.original is not None:
        matches = np.flatnonzero(digits == args.original)
        if not len(matches):
            raise SystemExit(f"no image of digit {args.original} in the split")
        i = int(matches[0])
    else:
        i = args.image_index
    xb = jnp.asarray(x[i : i + 1])
    ab = {k: jnp.asarray(np.asarray(v)[i : i + 1]) for k, v in attrs.items()}
    key = jax.random.PRNGKey(args.seed)

    # digit-mix path (reference mnist_mix_vae_gui.py:99: regenerate with the
    # one-hot interpolated between the original and --target digit)
    import jax as _jax

    scaled_ab = engine.scaler.scale({k: jnp.asarray(v) for k, v in ab.items()})
    codes = engine.bigan.encoder.apply({"params": engine.params_E}, xb, scaled_ab)
    eye = np.eye(10, dtype=np.float32)
    orig_dig = int(digits[i])

    @_jax.jit
    def _mix_gen(v):
        mixed = dict(scaled_ab)
        mixed["digit"] = jnp.asarray(
            ((1.0 - v) * eye[orig_dig] + v * eye[args.target]).reshape(1, 10)
        )
        return engine.bigan.generator.apply({"params": engine.params_G}, codes, mixed)

    def mix_image(v):
        return np.asarray(_mix_gen(jnp.float32(v))).reshape(28, 28)

    def cf_image(thickness, intensity, slant):
        iv = {
            "thickness": jnp.asarray([[thickness]], jnp.float32),
            "intensity": jnp.asarray([[intensity]], jnp.float32),
            "slant": jnp.asarray([[slant]], jnp.float32),
        }
        img, _ = engine.counterfactual(key, xb, ab, iv)
        return np.asarray(img).reshape(28, 28)

    t0 = float(np.asarray(attrs["thickness"])[i])
    i0 = float(np.asarray(attrs["intensity"])[i])
    s0 = float(np.asarray(attrs["slant"])[i])
    ranges = {
        "thickness": (float(scaler.mins["thickness"]), float(scaler.maxs["thickness"]), t0),
        "intensity": (float(scaler.mins["intensity"]), float(scaler.maxs["intensity"]), i0),
        "slant": (float(scaler.mins["slant"]), float(scaler.maxs["slant"]), s0),
    }

    import matplotlib

    if args.headless:
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(4, 5, figsize=(12, 10))
        for r, (name, (lo, hi, _)) in enumerate(ranges.items()):
            for c, v in enumerate(np.linspace(lo, hi, 5)):
                vals = dict(thickness=t0, intensity=i0, slant=s0)
                vals[name] = float(v)
                axes[r, c].imshow(cf_image(**vals), cmap="gray", vmin=-1, vmax=1)
                axes[r, c].set_title(f"{name}={v:.1f}", fontsize=8)
                axes[r, c].axis("off")
        for c, v in enumerate(np.linspace(0.0, 1.0, 5)):
            axes[3, c].imshow(mix_image(float(v)), cmap="gray", vmin=-1, vmax=1)
            axes[3, c].set_title(
                f"digit {orig_dig}->{args.target} mix={v:.2f}", fontsize=8)
            axes[3, c].axis("off")
        fig.suptitle("attribute sweeps + digit mix (headless GUI rendering)")
        fig.tight_layout()
        fig.savefig(args.output)
        print(f"saved {args.output}")
    else:
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Slider

        fig, ax = plt.subplots(figsize=(5, 6))
        plt.subplots_adjust(bottom=0.35)
        im = ax.imshow(cf_image(t0, i0, s0), cmap="gray", vmin=-1, vmax=1)
        ax.axis("off")
        sliders = {}
        for j, (name, (lo, hi, v0)) in enumerate(ranges.items()):
            sax = plt.axes([0.15, 0.29 - 0.07 * j, 0.7, 0.04])
            sliders[name] = Slider(sax, name, lo, hi, valinit=v0)
        sax = plt.axes([0.15, 0.29 - 0.07 * 3, 0.7, 0.04])
        sliders["mix"] = Slider(
            sax, f"digit {orig_dig}->{args.target}", 0.0, 1.0, valinit=0.0)

        def update(_):
            if sliders["mix"].val > 0:
                im.set_data(mix_image(sliders["mix"].val))
            else:
                im.set_data(
                    cf_image(sliders["thickness"].val, sliders["intensity"].val,
                             sliders["slant"].val)
                )
            fig.canvas.draw_idle()

        for s in sliders.values():
            s.on_changed(update)
        plt.show()

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
