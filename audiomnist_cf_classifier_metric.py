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
    # params are jit ARGUMENTS, uploaded once: a closed-over tree would be
    # lowered into the HLO as constants and carried by the remote_compile
    # RPC (the ESRF 512^2 "Broken pipe" failure mode), and a host numpy
    # tree passed per call would re-upload every chunk.
    clf_p = jax.device_put(ctree["params"])
    clf_fn = jax.jit(lambda p, im: sclf.apply({"params": p}, im))

    models = {"bigan": (jax.device_put(tree["params_E"]),
                        jax.device_put(tree["params_G"]))}
    if args.bigan_ft:
        ft_tree, _, _ = load_audio_bigan(os.path.join(args.model_dir, args.bigan_ft))
        models["bigan_ft"] = (jax.device_put(ft_tree["params_E"]),
                              jax.device_put(ft_tree["params_G"]))
    vae_bundle = None
    if args.vae:
        from imagecfgen_tpu.models.vae import ConditionalVAE, audio_mnist_vae_config

        vtree, vmeta = load_checkpoint(os.path.join(args.model_dir, args.vae))
        vae_bundle = (ConditionalVAE(audio_mnist_vae_config(d=vmeta.get("d", 64))),
                      jax.device_put(vtree["params"]))

    # normalise on the host CPU backend: doing it on the accelerator would
    # fetch the whole validation split back through the tunnel's ~24 KB/s
    # device->host leg
    from imagecfgen_tpu.ops.stft import host_prep

    spects, attrs, idx = data.all_spectrograms(
        excluded_runs=data.validation_excluded_runs
    )
    x_all = host_prep(stats.spect_to_img, spects)[..., None]
    subjects = data.raw["subject"][idx] - 1
    digits = attrs["digit"].argmax(axis=1)

    E_apply = jax.jit(lambda p, x, a: model.encoder.apply({"params": p}, x, a))
    G_apply = jax.jit(lambda p, z, a: model.generator.apply({"params": p}, z, a))

    hits = {m: [0, 0] for m in list(models) + (["vae"] if vae_bundle else []) + ["bigan_int"]}
    rng = jax.random.PRNGKey(args.seed)

    # fixed-size padded chunks: one digit's counterfactual set is the
    # whole validation split minus one digit (~90%), far past the 128^2
    # models' activation budget in a single batch; padding the tail keeps
    # every call the same shape (one compile per program)
    CHUNK = 256

    def padded_chunks(mask):
        (rows,) = np.nonzero(mask)
        for i in range(0, len(rows), CHUNK):
            sel = rows[i : i + CHUNK]
            pad = CHUNK - len(sel)
            yield np.concatenate([sel, np.repeat(sel[-1:], pad)]), len(sel)

    if vae_bundle:
        vm, vp = vae_bundle
        vae_enc = jax.jit(lambda p, x, a: vm.encoder.apply({"params": p}, x, a)[0])
        vae_dec = jax.jit(lambda p, z, a: vm.decoder.apply({"params": p}, z, a))

    for d in range(10):
        for sel, n in padded_chunks(digits != d):
            xb = jnp.asarray(x_all[sel])
            ab = {k: jnp.asarray(v[sel]) for k, v in attrs.items()}
            subj = subjects[sel]
            cf_a = dict(ab)
            cf_a["digit"] = jnp.zeros_like(ab["digit"]).at[:, d].set(1.0)

            for m, (pE, pG) in models.items():
                cf = G_apply(pG, E_apply(pE, xb, ab), cf_a)
                pred = np.asarray(jnp.argmax(clf_fn(clf_p, cf), axis=1))
                hits[m][0] += int((pred[:n] == subj[:n]).sum())
                hits[m][1] += n
            rng, kz = jax.random.split(rng)
            z = jax.random.normal(kz, (CHUNK, 1, 1, 512))
            cf = G_apply(models["bigan"][1], z, cf_a)
            pred = np.asarray(jnp.argmax(clf_fn(clf_p, cf), axis=1))
            hits["bigan_int"][0] += int((pred[:n] == subj[:n]).sum())
            hits["bigan_int"][1] += n
            if vae_bundle:
                cf = vae_dec(vp["decoder"], vae_enc(vp["encoder"], xb, ab), cf_a)
                pred = np.asarray(jnp.argmax(clf_fn(clf_p, cf), axis=1))
                hits["vae"][0] += int((pred[:n] == subj[:n]).sum())
                hits["vae"][1] += n
        print(f"digit {d} done", flush=True)

    for m, (c, t) in hits.items():
        print(f"{m}: subject-identity accuracy after digit CF = {c / max(t, 1):.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
