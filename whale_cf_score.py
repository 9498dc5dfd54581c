"""Whale-call CF effectiveness: flip the call type uniformly to a different
class, regenerate (BiGAN / fine-tuned / VAE), score with the NARW
classifier. Successor of ``whale_cf_score.py:48-79``.
"""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--nocall-dir", type=str, default=None)
parser.add_argument("--shotgun-dir", type=str, default=None)
parser.add_argument("--upcall-dir", type=str, default=None)
parser.add_argument("--synthetic-clips", type=int, default=32,
                    help="per-class clip count for the synthetic stand-in "
                    "(ignored when real data dirs are given)")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--bigan", type=str, default="whale-bigan.tar")
parser.add_argument("--bigan-ft", type=str, default=None)
parser.add_argument("--vae", type=str, default=None)
parser.add_argument("--clf", type=str, default="whale-clf.tar")
parser.add_argument("--batch-size", type=int, default=32)
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.whale_common import (
        collect_whale_arrays,
        load_whale_bigan,
        load_whale_dataset,
    )
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.models.bigan import BiGAN, whale_bigan_config
    from imagecfgen_tpu.models.classifier import CNNClassifier, narw_classifier_config

    data = load_whale_dataset(args.nocall_dir, args.shotgun_dir, args.upcall_dir,
                              synthetic_clips=args.synthetic_clips)
    tree, stats, _meta = load_whale_bigan(os.path.join(args.model_dir, args.bigan))
    x, calls, _ = collect_whale_arrays(data, "validation")

    ctree, cmeta = load_checkpoint(os.path.join(args.model_dir, args.clf))
    clf = CNNClassifier(narw_classifier_config(3, width=cmeta.get("width", 1.0)))
    clf_fn = jax.jit(lambda im: clf.apply({"params": ctree["params"]}, im))
    model = BiGAN(whale_bigan_config(d=_meta.get("d", 64)))

    models = {"bigan": (tree["params_E"], tree["params_G"])}
    if args.bigan_ft:
        t2, _, _ = load_whale_bigan(os.path.join(args.model_dir, args.bigan_ft))
        models["bigan_ft"] = (t2["params_E"], t2["params_G"])
    vae_bundle = None
    if args.vae:
        from imagecfgen_tpu.models.vae import ConditionalVAE, whale_vae_config

        vtree, _vmeta = load_checkpoint(os.path.join(args.model_dir, args.vae))
        vae_bundle = (ConditionalVAE(whale_vae_config(d=_vmeta.get("d", 64))), vtree["params"])

    rng = jax.random.PRNGKey(args.seed)
    hits = {m: [0, 0] for m in list(models) + (["vae"] if vae_bundle else [])}
    for i in range(0, len(x), args.batch_size):
        xb = jnp.asarray(x[i : i + args.batch_size])
        cb = jnp.asarray(calls[i : i + args.batch_size])
        cur = jnp.argmax(cb, axis=1)
        rng, k = jax.random.split(rng)
        # uniform resample excluding the current class (exact law of the
        # reference's rejection loop, whale_cf_score.py:62-65)
        logits = jnp.where(jax.nn.one_hot(cur, 3, dtype=bool), -jnp.inf, 0.0)
        new_cls = jax.random.categorical(k, logits, axis=-1)
        cf_a = {"call_type": jax.nn.one_hot(new_cls, 3)}
        ab = {"call_type": cb}
        for m, (pE, pG) in models.items():
            z = model.encoder.apply({"params": pE}, xb, ab)
            cf = model.generator.apply({"params": pG}, z, cf_a)
            pred = jnp.argmax(clf_fn(cf), axis=1)
            hits[m][0] += int((pred == new_cls).sum())
            hits[m][1] += len(xb)
        if vae_bundle:
            vm, vp = vae_bundle
            mean, _ = vm.encoder.apply({"params": vp["encoder"]}, xb, ab)
            cf = vm.decoder.apply({"params": vp["decoder"]}, mean, cf_a)
            pred = jnp.argmax(clf_fn(cf), axis=1)
            hits["vae"][0] += int((pred == new_cls).sum())
            hits["vae"][1] += len(xb)

    for m, (c, t) in hits.items():
        print(f"{m}: call-type cf accuracy = {c / max(t, 1):.4f}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
