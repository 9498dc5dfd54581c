"""AudioMNIST VAE CF-effectiveness (successor of ``audiomnist_vae_score.py``:
mirror of the BiGAN score with encoder-mean abduction)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--zip-path", "-d", "--data", type=str,
                    default="AudioMNIST-data.zip")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--attribute", "--cf-attr", type=str, default="digit")
parser.add_argument("--image-model", "-m", type=str, default=None,
                    help="VAE checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attribute-model", "-a", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--digit-clf", type=str, default=None)
parser.add_argument("--gender-clf", type=str, default=None)
parser.add_argument("--accent-clf", type=str, default=None)
parser.add_argument("--mc-rounds", "-r", type=int, default=4,
                    help="CF target resamples per batch, scores averaged")
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.audio_common import load_audio_dataset, load_audio_scm
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.data.audio_mnist import VALIDATION_RUNS
    from imagecfgen_tpu.metrics.scores import resample_excluding
    from imagecfgen_tpu.models.classifier import CNNClassifier, audio_mnist_classifier_config
    from imagecfgen_tpu.models.vae import ConditionalVAE, audio_mnist_vae_config
    from imagecfgen_tpu.ops.spectral import SpectStats
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES

    data = load_audio_dataset(args.zip_path)
    vtree, vmeta = load_checkpoint(args.image_model or os.path.join(args.model_dir, "audio-mnist-vae.tar"))
    stats = SpectStats(jnp.asarray(vtree["spect_mean"]), jnp.asarray(vtree["spect_std"]))
    scm = load_audio_scm(args.attribute_model or os.path.join(args.model_dir, "audio-mnist-attribute-scm.tar"))
    ctree, cmeta = load_checkpoint(
        {"digit": args.digit_clf, "gender": args.gender_clf, "accent": args.accent_clf}.get(args.attribute)
        or os.path.join(args.model_dir, f"audio-mnist-{args.attribute}-clf.tar")
    )
    clf = CNNClassifier(audio_mnist_classifier_config(
        CARDINALITIES[args.attribute], width=cmeta.get("width", 1.0)))
    clf_fn = jax.jit(lambda im: clf.apply({"params": ctree["params"]}, im))
    model = ConditionalVAE(audio_mnist_vae_config(d=vmeta.get("d", 64)))

    spects, attrs, _ = data.all_spectrograms(
        excluded_runs=data.validation_excluded_runs
    )
    x = np.asarray(stats.spect_to_img(jnp.asarray(spects)))[..., None]

    rng = jax.random.PRNGKey(args.seed)
    correct = total = 0
    for i in range(0, len(x), args.batch_size):
        xb = jnp.asarray(x[i : i + args.batch_size])
        ab = {k: jnp.asarray(v[i : i + args.batch_size]) for k, v in attrs.items()}
        mean, _ = model.encoder.apply({"params": vtree["params"]["encoder"]}, xb, ab)
        obs = {k: jnp.argmax(v, axis=1) for k, v in ab.items()}
        for _r in range(args.mc_rounds):
            rng, k1, k2 = jax.random.split(rng, 3)
            new_cls = resample_excluding(scm.graph, scm.params, scm.state, k1, args.attribute, obs)
            cf_obs = scm.sample_cf(k2, obs, {args.attribute: new_cls})
            cf_ab = {
                k: jax.nn.one_hot(cf_obs[k].reshape((-1,)).astype(jnp.int32), CARDINALITIES[k])
                for k in CARDINALITIES
            }
            rec = model.decoder.apply({"params": vtree["params"]["decoder"]}, mean, cf_ab)
            pred = jnp.argmax(clf_fn(rec), axis=1)
            correct += int((pred == new_cls).sum())
            total += len(xb)
    print(f"vae {args.attribute} cf accuracy: {correct / max(total, 1):.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
