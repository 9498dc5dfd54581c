"""Quality evaluation for the ESRF 512^2 BiGAN at real scale.

The reference never ships a scorer for this family (it only trains it,
``/root/reference/train_esrf_bigan.py:17-35``), so this tool defines the
quality evidence for the at-scale run:

- validation reconstruction MSE / SSIM through E -> G;
- a classifier-free counterfactual-effectiveness metric: the synthetic
  stand-in's boat signature is a 25-150 Hz harmonic rumble stack
  (``imagecfgen_tpu/data/esrf.py::_load_synthetic``), which occupies STFT
  rows 3-19 at the ESRF config (n_fft=1023 over 8 kHz -> 7.8125 Hz/bin).
  ``do(has_boat=1)`` on a no-boat window must raise linear-magnitude
  energy in those rows; ``do(has_boat=0)`` on a boat window must lower
  it. We report the median per-window energy ratio (cf / original) in
  the rumble band for both directions, plus the same ratio in a control
  band (1-2 kHz) that the intervention should leave alone.

Run on the TPU; fetches scalars only (the axon tunnel's device->host
path is ~24 KB/s).
"""
from argparse import ArgumentParser
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = ArgumentParser()
parser.add_argument("--model-dir", type=str, default="")
parser.add_argument("--bigan", type=str, default="esrf-bigan.tar")
parser.add_argument("--synthetic-recordings", type=int, default=24,
                    help="must match the training run's stand-in size")
parser.add_argument("--batch-size", type=int, default=16)
parser.add_argument("--cf-distance", type=float, default=10.0,
                    help="closest_boat used when intervening has_boat -> 1")
parser.add_argument("--wav-dir", type=str, default=None)
parser.add_argument("--label-csv", type=str, default=None)

RUMBLE_ROWS = (3, 20)    # 23.4 - 156 Hz: the stand-in's harmonic stack
CONTROL_ROWS = (128, 256)  # 1 - 2 kHz: untouched by the intervention

if __name__ == "__main__":
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    from imagecfgen_tpu.core.checkpoint import load_checkpoint
    from imagecfgen_tpu.data.esrf import EsrfStation
    from imagecfgen_tpu.models.bigan import BiGAN, esrf_bigan_config
    from imagecfgen_tpu.ops.spectral import SpectStats
    from imagecfgen_tpu.ops.ssim import ssim

    if args.wav_dir and os.path.isdir(args.wav_dir):
        data = EsrfStation(args.wav_dir, args.label_csv)
    else:
        if args.wav_dir:
            print(f"warning: {args.wav_dir} not found; using the synthetic ESRF stand-in")
        data = EsrfStation(synthetic_recordings=args.synthetic_recordings)

    tree, meta = load_checkpoint(os.path.join(args.model_dir, args.bigan))
    stats = SpectStats(jnp.asarray(tree["spect_mean"]), jnp.asarray(tree["spect_std"]))
    model = BiGAN(esrf_bigan_config(d=meta.get("d", 64)))

    def put_tree(label, t):
        """Upload leaf-by-leaf with progress: one lazy bulk upload of the
        ~2 GB E+G params inside the first jitted call stalls the axon
        relay the same way round 3's monolithic device_get did; explicit
        per-leaf puts stream in relay-sized pieces and make a wedge
        attributable to a specific leaf."""
        leaves, treedef = jax.tree_util.tree_flatten(t)
        out, sent = [], 0
        for leaf in leaves:
            out.append(jax.device_put(leaf))
            out[-1].block_until_ready()
            sent += leaf.nbytes if hasattr(leaf, "nbytes") else 0
            print(f"[esrf] upload {label}: {sent / 2**20:.0f} MB", flush=True)
        return jax.tree_util.tree_unflatten(treedef, out)

    pE = put_tree("params_E", tree["params_E"])
    pG = put_tree("params_G", tree["params_G"])

    def band_energy(spect, rows):
        """Mean linear-magnitude energy of STFT rows [rows[0], rows[1])."""
        mag = jnp.exp(spect[:, rows[0]:rows[1], :, 0])
        return (mag ** 2).mean(axis=(1, 2))

    # The eval is deliberately SPLIT into four small jitted programs
    # instead of one fused graph: with the axon PJRT plugin every compile
    # is one long-held server-side ``remote_compile`` HTTP RPC, and the
    # fused 512^2 E+G+G+SSIM+STFT-stats graph's RPC broke with
    # "Broken pipe" at ~25-30 min on three consecutive attempts. Each
    # split piece compiles in minutes and the generator program is reused
    # for both the reconstruction and the counterfactual pass. XLA loses
    # cross-stage fusion, but eval is a few dozen batches — compile
    # robustness dominates.
    #
    # CRITICAL: the params must be jit *arguments*, never closures. A
    # closed-over param tree is lowered into the HLO as embedded
    # constants, so the remote_compile RPC payload carries the ~2 GB of
    # E+G weights — that RPC broke with "Broken pipe" at ~25 min on five
    # consecutive attempts. As arguments the weights stay on the device
    # (they were streamed up leaf-by-leaf above) and the HLO is a few MB.
    @jax.jit
    def prep(spect):
        return stats.spect_to_img(spect)[..., None]

    @jax.jit
    def encode(p, img, has_boat, dist_scaled):
        attrs = {"has_boat": has_boat, "closest_boat": dist_scaled}
        return model.encoder.apply({"params": p}, img, attrs)

    @jax.jit
    def generate(p, z, has_boat, dist_scaled):
        attrs = {"has_boat": has_boat, "closest_boat": dist_scaled}
        return model.generator.apply({"params": p}, z, attrs)

    @jax.jit
    def recon_metrics(rec, img):
        mse = ((rec - img) ** 2).mean(axis=(1, 2, 3))
        ss = ssim(rec, img, data_range=2.0, size_average=False)
        return mse, ss

    @jax.jit
    def band_ratios(cf, img):
        orig_spect = stats.img_to_spect(img[..., 0])[..., None]
        cf_spect = stats.img_to_spect(cf[..., 0])[..., None]
        ratio_r = band_energy(cf_spect, RUMBLE_ROWS) / band_energy(orig_spect, RUMBLE_ROWS)
        ratio_c = band_energy(cf_spect, CONTROL_ROWS) / band_energy(orig_spect, CONTROL_ROWS)
        return ratio_r, ratio_c

    def eval_batch(spect, has_boat_np, dist_scaled, cf_dist_scaled):
        img = prep(spect) if spect.ndim == 3 else spect
        has_boat = jnp.asarray(has_boat_np)
        z = encode(pE, img, has_boat, dist_scaled)
        rec = generate(pG, z, has_boat, dist_scaled)
        mse, ss = recon_metrics(rec, img)
        # intervene: flip has_boat for every window (host-side flag math)
        cur = np.argmax(has_boat_np, axis=1)          # 1 = boat present
        cf_flag = np.eye(2, dtype=np.float32)[1 - cur]
        # add boat at cf_dist / remove boat
        cf_d = np.where(cur == 0, cf_dist_scaled, -1.0).astype(np.float32)
        cf = generate(pG, z, jnp.asarray(cf_flag), jnp.asarray(cf_d))
        ratio_r, ratio_c = band_ratios(cf, img)
        return mse, ss, ratio_r, ratio_c, cur

    cf_dist_scaled = 2 * args.cf_distance / 100.0 - 1.0
    mses, ssims, add_r, rem_r, add_c, rem_c = [], [], [], [], [], []
    # the first eval_batch call compiles the split 512^2 programs —
    # silent server-side RPCs of minutes each that the stage watchdog
    # would kill without a liveness line
    from imagecfgen_tpu.utils.heartbeat import Heartbeat

    done = 0
    with Heartbeat("esrf eval (upload/compile/batches)", prefix="esrf"):
        for batch in data.stream(batch_size=args.batch_size,
                                 mode="validation", shuffle=False):
            mse, ss, rr, rc, cur = eval_batch(
                jnp.asarray(batch["audio"]), np.asarray(batch["has_boat"]),
                jnp.asarray(batch["closest_boat"]), cf_dist_scaled)
            mse, ss, rr, rc, cur = map(np.asarray, (mse, ss, rr, rc, cur))
            mses.append(mse); ssims.append(ss)
            add_r.append(rr[cur == 0]); rem_r.append(rr[cur == 1])
            add_c.append(rc[cur == 0]); rem_c.append(rc[cur == 1])
            done += len(mse)
            print(f"[esrf] {done} windows scored", flush=True)

    all_mse = np.concatenate(mses)
    mse = float(np.mean(all_mse))
    ss = float(np.mean(np.concatenate(ssims)))
    add_r = np.concatenate(add_r); rem_r = np.concatenate(rem_r)
    add_c = np.concatenate(add_c); rem_c = np.concatenate(rem_c)
    print(f"validation windows: {len(all_mse)} "
          f"(no-boat {len(add_r)}, boat {len(rem_r)})")
    print(f"reconstruction: mse={mse:.4f} ssim={ss:.4f}")
    if len(add_r):
        print(f"do(has_boat=1, d={args.cf_distance:g}): rumble-band energy ratio "
              f"median {np.median(add_r):.3f} (want > 1), "
              f"control-band {np.median(add_c):.3f} (want ~ 1)")
    if len(rem_r):
        print(f"do(has_boat=0): rumble-band energy ratio "
              f"median {np.median(rem_r):.3f} (want < 1), "
              f"control-band {np.median(rem_c):.3f} (want ~ 1)")

    from imagecfgen_tpu.cli.common import clean_exit
    clean_exit()
