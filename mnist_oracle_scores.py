"""Oracle-agreement + JS-divergence benchmark for CF explainers.

Successor of ``mnist_oracle_scores.py:82-237``: for each test image pick a
random target class, produce CFs with the BiGAN/VAE hinge and mixture
explainers, then record each per-digit binary oracle's sigmoid score and
the Jensen-Shannon divergence between the classifier distribution and the
normalised oracle-score distribution. CSV output.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--oracle-dir", type=str, default="")
parser.add_argument("--bigan", type=str, default="mnist-bigan.tar")
parser.add_argument("--limit", type=int, default=64)
parser.add_argument("--steps", type=int, default=100)
parser.add_argument("--lr", type=float, default=0.01)
parser.add_argument("--weight", type=float, default=10.0,
                    help="hinge-loss weight (explainer c)")
parser.add_argument("--train-codes", action="store_true",
                    help="also optimize the latent code (reference default: off)")
parser.add_argument("--output", type=str, default="mnist_oracle_scores.csv")
parser.add_argument("--seed", type=int, default=42)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from imagecfgen_tpu.cf.explain import DeepCounterfactualExplainer, HingeLossCFExplainer
    from imagecfgen_tpu.cli.common import (
        load_bigan,
        load_mnist_training_data,
        scale_attrs_np,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.models.classifier import (
        CNNClassifier,
        mnist_classifier_config,
        mnist_oracle_config,
    )

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, scaler = load_mnist_training_data(args.data_dir, split)
    a_scaled = scale_attrs_np(scaler, attrs)
    n = min(args.limit, len(x))

    tree, _, _ = load_bigan(os.path.join(args.model_dir, args.bigan))
    clf_tree, _ = load_checkpoint(os.path.join(args.model_dir, "mnist_clf.tar"))
    model = BiGAN(mnist_bigan_config())
    clf = CNNClassifier(mnist_classifier_config())
    E_fn = jax.jit(lambda xx, aa: model.encoder.apply({"params": tree["params_E"]}, xx, aa))
    G_fn = jax.jit(lambda zz, aa: model.generator.apply({"params": tree["params_G"]}, zz, aa))
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    oracle = CNNClassifier(mnist_oracle_config())
    oracle_dir = args.oracle_dir or args.model_dir
    oracle_params = []
    for d in range(10):
        otree, _ = load_checkpoint(os.path.join(oracle_dir, f"oracle-{d}.tar"))
        oracle_params.append(otree["params"])
    oracle_fn = jax.jit(lambda p, im: jax.nn.sigmoid(oracle.apply({"params": p}, im)))

    def oracle_scores(cf):
        return np.asarray([float(oracle_fn(p, cf)[0, 0]) for p in oracle_params])

    def js_divergence(p, q, eps=1e-9):
        p = np.asarray(p) + eps
        q = np.asarray(q) + eps
        p, q = p / p.sum(), q / q.sum()
        m = 0.5 * (p + q)
        kl = lambda a, b: float((a * np.log(a / b)).sum())
        return 0.5 * kl(p, m) + 0.5 * kl(q, m)

    explainers = {
        "bigan": HingeLossCFExplainer(
            E_fn, G_fn, clf_fn, target_feature="digit", latent_dim=512,
            c=args.weight,
            categorical_features=("digit",), features_to_ignore=("slant", "intensity"),
        ),
        "bigan_agnostic": DeepCounterfactualExplainer(E_fn, G_fn, clf_fn, "digit"),
    }

    # Pixel-space baseline columns (reference mnist_oracle_scores.py:108-139
    # uses omnixai's ContrastiveExplainer -> "pn" and
    # CounterfactualExplainer -> "cf"); produced here by the framework's
    # from-scratch Wachter-CF / CEM reimplementation
    # (imagecfgen_tpu/cf/baselines.py), batched as one jitted program each.
    from imagecfgen_tpu.cf.baselines import PixelBaselineExplainers

    _builtin = PixelBaselineExplainers(clf_fn, steps=args.steps * 3, lr=args.lr)
    _x_all = jnp.asarray(x[:n])
    _cf_all, _ = _builtin.counterfactual(_x_all)
    _pn_all, _, _, _ = _builtin.contrastive(_x_all)
    baseline_images = {"cf": np.asarray(_cf_all), "pn": np.asarray(_pn_all)}

    rng = np.random.default_rng(args.seed)
    digits = np.asarray(attrs["digit"]).argmax(axis=1)
    rows = []
    for i in range(n):
        xb = jnp.asarray(x[i : i + 1])
        ab = {k: jnp.asarray(np.asarray(v)[i : i + 1]) for k, v in a_scaled.items()}
        digit = int(digits[i])
        target = int(rng.choice([c for c in range(10) if c != digit]))
        row = {"digit": digit, "target_class": target}
        for name, ex in explainers.items():
            if isinstance(ex, HingeLossCFExplainer):
                cf = ex.explain(xb, ab, target_class=target, steps=args.steps,
                                lr=args.lr, train_z=args.train_codes,
                                rng=jax.random.PRNGKey(args.seed + i))
            else:
                samples, _ = ex.explain(xb, ab, target_class=target, sample_points=50)
                cf = jnp.asarray(samples[:1])
            probs = np.asarray(jax.nn.softmax(clf_fn(cf), axis=1))[0]
            os_ = oracle_scores(cf)
            row[f"{name}_label"] = int(probs.argmax())
            row[f"{name}_oracle_agree"] = int(os_.argmax() == probs.argmax())
            row[f"{name}_js"] = js_divergence(probs, os_)
            for j in range(10):
                row[f"{name}_os_{j}"] = os_[j]
        # Baseline columns (reference mnist_oracle_scores.py:122-139
        # 'cf'/'pn' methods), scored identically to the SCM explainers
        for name in ("cf", "pn"):
            bcf = jnp.asarray(baseline_images[name][i : i + 1])
            probs = np.asarray(jax.nn.softmax(clf_fn(bcf), axis=1))[0]
            os_ = oracle_scores(bcf)
            row[f"{name}_label"] = int(probs.argmax())
            row[f"{name}_oracle_agree"] = int(os_.argmax() == probs.argmax())
            row[f"{name}_js"] = js_divergence(probs, os_)
            for j in range(10):
                row[f"{name}_os_{j}"] = os_[j]
        rows.append(row)

    pd.DataFrame(rows).to_csv(args.output, index=False)
    agree_cols = [c for c in rows[0] if c.endswith("oracle_agree")]
    for c in agree_cols:
        print(f"{c}: {np.mean([r[c] for r in rows]):.4f}")
    print(f"saved {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
