"""Side-by-side AudioMNIST reconstruction grids + wavs (successor of
``audio_mnist_reconstruction.py:28-98``)."""
from argparse import ArgumentParser
import os

parser = ArgumentParser()
parser.add_argument("--zip-path", "-d", "--data", type=str,
                    default="AudioMNIST-data.zip")
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--bigan", type=str, default="audio-mnist-bigan.tar")
parser.add_argument("--n-show", type=int, default=4)
parser.add_argument("--output", type=str, default="audio-reconstructions")
parser.add_argument("--write-wavs", action="store_true")
parser.add_argument("--seed", type=int, default=0)

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.audio_common import load_audio_bigan, load_audio_dataset
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.cli.common import save_grid_png
    from imagecfgen_tpu.data.audio_mnist import (
        SAMPLE_RATE,
        VALIDATION_RUNS,
        audio_from_log_spect,
    )
    from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config

    data = load_audio_dataset(args.zip_path)
    tree, stats, _meta = load_audio_bigan(os.path.join(args.model_dir, args.bigan))
    model = BiGAN(audio_mnist_bigan_config(d=_meta.get("d", 64)))

    batch = next(
        data.stream(
            batch_size=args.n_show,
            excluded_runs=data.validation_excluded_runs,
            seed=args.seed,
        )
    )
    x = stats.spect_to_img(jnp.asarray(batch["audio"]))[..., None]
    attrs = {k: jnp.asarray(batch[k]) for k in
             ("accent", "age", "country_of_origin", "digit", "gender", "native_speaker")}

    codes = model.encoder.apply({"params": tree["params_E"]}, x, attrs)
    recon = model.generator.apply({"params": tree["params_G"]}, codes, attrs)
    z = jax.random.normal(jax.random.PRNGKey(args.seed), codes.shape)
    gener = model.generator.apply({"params": tree["params_G"]}, z, attrs)

    os.makedirs(args.output, exist_ok=True)
    n = args.n_show
    real_s = np.asarray(stats.img_to_spect(x[..., 0]))
    rec_s = np.asarray(stats.img_to_spect(recon[..., 0]))
    gen_s = np.asarray(stats.img_to_spect(gener[..., 0]))
    vmin, vmax = real_s.min(), real_s.max()
    save_grid_png(
        os.path.join(args.output, "reconstructions.png"),
        [gen_s, real_s, rec_s],
        ["G(z, c)", "x", "G(E(x, c), c)"],
        title="AudioMNIST reconstructions",
        vmin=vmin, vmax=vmax,
    )
    if args.write_wavs:
        from scipy.io import wavfile

        for name, spec in (("generated", gen_s[:1]), ("real", real_s[:1]),
                           ("reconstructed", rec_s[:1])):
            wav = np.asarray(audio_from_log_spect(jnp.asarray(spec)))[0]
            wav = wav / max(np.abs(wav).max(), 1e-9)
            wavfile.write(
                os.path.join(args.output, f"{name}.wav"), SAMPLE_RATE,
                np.int16(wav * 32767),
            )
    print(f"saved outputs to {args.output}")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
