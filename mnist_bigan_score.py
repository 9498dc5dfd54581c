"""CF-effectiveness score for the BiGAN: classifier accuracy on the
intervened digit after a counterfactual digit swap.

Successor of ``mnist_bigan_score.py:64-100`` — the host-side
resample-until-different loop becomes an exact masked categorical draw on
device (``imagecfgen_tpu/metrics/scores.py``).
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--data-dir", type=str, default="")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("-m", "--image-model", type=str, default=None,
                    help="explicit BiGAN checkpoint path (reference "
                         "mnist_bigan_score.py -m flag); defaults to "
                         "<model-dir>/mnist-bigan.tar")
parser.add_argument("-a", "--attribute-model", type=str, default=None)
parser.add_argument("-c", "--classifier", type=str, default=None)
parser.add_argument("--batch-size", type=int, default=512)
parser.add_argument("--mc-rounds", type=int, default=1)
parser.add_argument("--limit", type=int, default=4096)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--held-out-shift", nargs=3, type=float, default=None,
                    metavar=("THICKNESS", "INTENSITY", "SLANT"),
                    help="compound intervention: besides the digit swap, "
                         "intervene each continuous attribute at "
                         "(observed + shift) — magnitudes beyond the "
                         "training range de-saturate the metric "
                         "(hard-battery mode)")

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
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.metrics.scores import cf_effectiveness_score
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, mnist_classifier_config

    split = "test" if os.path.exists(os.path.join(args.data_dir, "mnist-x-test.npy")) else "train"
    x, attrs, _ = load_mnist_training_data(args.data_dir, split)
    x, attrs = x[: args.limit], {k: np.asarray(v)[: args.limit] for k, v in attrs.items()}

    tree, scaler, _ = load_bigan(
        args.image_model or os.path.join(args.model_dir, "mnist-bigan.tar")
    )
    scm = load_attribute_scm(
        args.attribute_model
        or os.path.join(args.model_dir, "mnist-attribute-scm.tar")
    )
    clf_tree, _ = load_checkpoint(
        args.classifier or os.path.join(args.model_dir, "mnist_clf.tar")
    )
    clf = CNNClassifier(mnist_classifier_config())
    clf_fn = jax.jit(lambda im: clf.apply({"params": clf_tree["params"]}, im))

    model = BiGAN(mnist_bigan_config())
    engine = CounterfactualEngine(model, tree["params_E"], tree["params_G"], scm, scaler)

    rng = jax.random.PRNGKey(args.seed)
    scores = []
    for i in range(0, len(x), args.batch_size):
        xb = jnp.asarray(x[i : i + args.batch_size])
        ab = {k: jnp.asarray(v[i : i + args.batch_size]) for k, v in attrs.items()}
        rng, k = jax.random.split(rng)
        shift = None
        if args.held_out_shift:
            shift = dict(zip(("thickness", "intensity", "slant"),
                             args.held_out_shift))
        scores.append(
            cf_effectiveness_score(engine, clf_fn, xb, ab, k,
                                   mc_rounds=args.mc_rounds,
                                   held_out_shift=shift)
        )
    print(f"cf digit accuracy: {float(np.mean(scores)):.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
