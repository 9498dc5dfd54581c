"""Run the REFERENCE torch train loop on the battery's synthetic data to
compare D/EG equilibrium trajectories against our TPU trainer (VERDICT
round-1 item 6: "investigate GAN equilibrium trajectories vs the
reference's").

Usage: python tools/ref_trajectory.py [--data-dir .battery_data]
       [--epochs 4] [--d-updates 3]

Prints the reference's own per-epoch `D_score EG_score` lines (its
train() prints sigmoid means averaged over the epoch,
image_scms/mnist.py:249). Read-only w.r.t. /root/reference.
"""
import argparse
import os
import sys

ap = argparse.ArgumentParser()
ap.add_argument("--data-dir", default=".battery_data")
ap.add_argument("--epochs", type=int, default=4)
ap.add_argument("--d-updates", type=int, default=3)
ap.add_argument("--limit", type=int, default=8192)
args = ap.parse_args()

sys.path.insert(0, "/root/reference")
import types  # noqa: E402

import numpy as np  # noqa: E402
import torch  # noqa: E402

# the reference's training_utils imports pytorch_msssim at module level;
# the MNIST train loop never calls ssim, so a stub suffices offline
_msssim = types.ModuleType("pytorch_msssim")
_msssim.ssim = lambda *a, **k: torch.zeros(())
sys.modules.setdefault("pytorch_msssim", _msssim)

from image_scms.mnist import train  # noqa: E402

x = np.load(os.path.join(args.data_dir, "mnist-x-train.npy"))[: args.limit]
a = np.load(os.path.join(args.data_dir, "mnist-a-train.npy"))[: args.limit]
x_t = torch.from_numpy(x.astype(np.float32))
a_t = {
    "digit": torch.from_numpy(a[:, :10].astype(np.float32)),
    "thickness": torch.from_numpy(a[:, 10:11].astype(np.float32)),
    "intensity": torch.from_numpy(a[:, 11:12].astype(np.float32)),
    "slant": torch.from_numpy(a[:, 12:13].astype(np.float32)),
}
train(
    x_t,
    a_t,
    n_epochs=args.epochs,
    device="cpu",
    save_images_every=10_000,
    batch_size=64,
    d_updates_per_g_update=args.d_updates,
)
