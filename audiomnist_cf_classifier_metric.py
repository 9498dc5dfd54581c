"""Subject-identity preservation via the 60-way subject classifier: does
the classifier still recognise the subject after a digit counterfactual?

Successor of ``audiomnist_cf_classifier_metric.py:58-108``.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--zip-path", type=str, default=None)
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--bigan", type=str, default="audio-mnist-bigan.tar")
parser.add_argument("--bigan-ft", type=str, default=None)
parser.add_argument("--vae", type=str, default=None)
parser.add_argument("--subject-clf", type=str, default="audio-mnist-subject-clf.tar")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.audio_common import load_audio_bigan, load_audio_dataset
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.data.audio_mnist import VALIDATION_RUNS
    from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, audio_mnist_classifier_config

    data = load_audio_dataset(args.zip_path)
    tree, stats, _meta = load_audio_bigan(os.path.join(args.model_dir, args.bigan))
    model = BiGAN(audio_mnist_bigan_config(d=_meta.get("d", 64)))

    ctree, cmeta = load_checkpoint(os.path.join(args.model_dir, args.subject_clf))
    sclf = CNNClassifier(audio_mnist_classifier_config(60, width=cmeta.get("width", 1.0)))
    clf_fn = jax.jit(lambda im: sclf.apply({"params": ctree["params"]}, im))

    models = {"bigan": (tree["params_E"], tree["params_G"])}
    if args.bigan_ft:
        ft_tree, _, _ = load_audio_bigan(os.path.join(args.model_dir, args.bigan_ft))
        models["bigan_ft"] = (ft_tree["params_E"], ft_tree["params_G"])
    vae_bundle = None
    if args.vae:
        from imagecfgen_tpu.models.vae import ConditionalVAE, audio_mnist_vae_config

        vtree, _ = load_checkpoint(os.path.join(args.model_dir, args.vae))
        vae_bundle = (ConditionalVAE(audio_mnist_vae_config()), vtree["params"])

    spects, attrs, idx = data.all_spectrograms(
        excluded_runs=data.validation_excluded_runs
    )
    x_all = np.asarray(stats.spect_to_img(jnp.asarray(spects)))[..., None]
    subjects = data.raw["subject"][idx] - 1
    digits = attrs["digit"].argmax(axis=1)

    E_apply = jax.jit(lambda p, x, a: model.encoder.apply({"params": p}, x, a))
    G_apply = jax.jit(lambda p, z, a: model.generator.apply({"params": p}, z, a))

    hits = {m: [0, 0] for m in list(models) + (["vae"] if vae_bundle else []) + ["bigan_int"]}
    rng = jax.random.PRNGKey(args.seed)

    for d in range(10):
        nd = digits != d
        xb = jnp.asarray(x_all[nd])
        ab = {k: jnp.asarray(v[nd]) for k, v in attrs.items()}
        subj = jnp.asarray(subjects[nd])
        cf_a = dict(ab)
        cf_a["digit"] = jnp.zeros_like(ab["digit"]).at[:, d].set(1.0)

        for m, (pE, pG) in models.items():
            cf = G_apply(pG, E_apply(pE, xb, ab), cf_a)
            pred = jnp.argmax(clf_fn(cf), axis=1)
            hits[m][0] += int((pred == subj).sum())
            hits[m][1] += len(xb)
        rng, kz = jax.random.split(rng)
        z = jax.random.normal(kz, (xb.shape[0], 1, 1, 512))
        cf = G_apply(models["bigan"][1], z, cf_a)
        pred = jnp.argmax(clf_fn(cf), axis=1)
        hits["bigan_int"][0] += int((pred == subj).sum())
        hits["bigan_int"][1] += len(xb)
        if vae_bundle:
            vm, vp = vae_bundle
            mean, _ = vm.encoder.apply({"params": vp["encoder"]}, xb, ab)
            cf = vm.decoder.apply({"params": vp["decoder"]}, mean, cf_a)
            pred = jnp.argmax(clf_fn(cf), axis=1)
            hits["vae"][0] += int((pred == subj).sum())
            hits["vae"][1] += len(xb)

    for m, (c, t) in hits.items():
        print(f"{m}: subject-identity accuracy after digit CF = {c / max(t, 1):.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
