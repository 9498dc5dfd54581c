"""Generate spoken-digit samples: attrs ~ causal graph -> G(z, a) ->
Griffin-Lim -> wav + JSON attribute dump (+ optional classifier sanity
predictions).

Successor of the reference ``audiomnist_generate.py:47-133``.
"""
from argparse import ArgumentParser
import json
import os

parser = ArgumentParser()
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--zip-path", "-d", "--data", type=str,
                    default="AudioMNIST-data.zip")
parser.add_argument("--num-samples", "-n", type=int, default=10)
parser.add_argument("--mc-rounds", "-r", type=int, default=1)
parser.add_argument("--outdir", "-o", type=str, default=".")
parser.add_argument("--image-model", "-m", type=str, default=None,
                    help="BiGAN checkpoint file (overrides --model-dir layout)")
parser.add_argument("--attribute-model", "-a", type=str, default=None,
                    help="attribute-SCM checkpoint file (overrides --model-dir layout)")
parser.add_argument("--digit-clf", type=str, default=None)
parser.add_argument("--gender-clf", type=str, default=None)
parser.add_argument("--accent-clf", type=str, default=None)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.io import wavfile

    from imagecfgen_tpu.cli.audio_common import (
        load_audio_bigan,
        load_audio_dataset,
        load_audio_scm,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.data.audio_mnist import SAMPLE_RATE, audio_from_log_spect
    from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES

    tree, stats, meta = load_audio_bigan(args.image_model or os.path.join(args.model_dir, "audio-mnist-bigan.tar"))
    scm = load_audio_scm(args.attribute_model or os.path.join(args.model_dir, "audio-mnist-attribute-scm.tar"))
    data = load_audio_dataset(args.zip_path)
    model = BiGAN(audio_mnist_bigan_config(d=meta.get("d", 64)))

    n = args.num_samples
    rng = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(rng)
    samp = scm.sample(k1, n=n)
    attrs = {
        k: jax.nn.one_hot(samp[k].reshape((-1,)).astype(jnp.int32), card)
        for k, card in CARDINALITIES.items()
    }

    gen = 0
    for r in range(args.mc_rounds):
        z = jax.random.normal(jax.random.fold_in(k2, r), (n, 1, 1, 512))
        gen = gen + model.generator.apply({"params": tree["params_G"]}, z, attrs)
    gen = gen / args.mc_rounds
    spect = stats.img_to_spect(gen[..., 0])

    # classifier sanity predictions on the generated spectrograms
    preds = {}
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.classifier import CNNClassifier, audio_mnist_classifier_config

    for name, path in (("digit", args.digit_clf), ("gender", args.gender_clf),
                       ("accent", args.accent_clf)):
        if path:
            ctree, cmeta = load_checkpoint(path)
            clf = CNNClassifier(audio_mnist_classifier_config(
                CARDINALITIES[name], width=cmeta.get("width", 1.0)))
            logits = clf.apply({"params": ctree["params"]}, spect[..., None])
            preds[name] = np.asarray(jnp.argmax(logits, axis=1))

    wavs = np.asarray(audio_from_log_spect(spect, rng=k2))
    os.makedirs(args.outdir, exist_ok=True)
    vocabs = data.vocabs
    for i in range(n):
        w = wavs[i] / max(np.abs(wavs[i]).max(), 1e-9)
        wavfile.write(
            os.path.join(args.outdir, f"sample-{i}.wav"), SAMPLE_RATE,
            np.int16(w * 32767),
        )
        record = {}
        for k in CARDINALITIES:
            code = int(np.asarray(samp[k]).reshape(-1)[i])
            if k == "age":
                record[k] = f"bin-{code}"
            else:
                record[k] = str(vocabs[k].categories[code]) if k in vocabs else str(code)
        for k, p in preds.items():
            record[f"{k}_pred"] = str(vocabs[k].categories[int(p[i])]) if k in vocabs else str(int(p[i]))
        with open(os.path.join(args.outdir, f"sample-{i}.json"), "w") as fp:
            json.dump(record, fp, indent=4)
        print(json.dumps(record))
    print(f"wrote {n} wav/json pairs to {args.outdir}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
