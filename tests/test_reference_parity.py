"""Numerical parity vs the PyTorch reference (torch CPU is available).

Builds the reference MNIST BiGAN modules, converts their weights with
tools/convert_reference_checkpoint, and checks that this framework's
E/G/D produce the same outputs on the same inputs (eval mode). This pins
down conv/deconv/embedding/batch-norm semantics exactly.
"""
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

# the reference's training_utils imports pytorch_msssim (absent here)
if "pytorch_msssim" not in sys.modules:
    shim = types.ModuleType("pytorch_msssim")
    shim.ssim = lambda *a, **k: torch.tensor(0.0)
    sys.modules["pytorch_msssim"] = shim
sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.join(REPO, "tools"))

from image_scms import mnist as ref_mnist  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from convert_reference_checkpoint import (  # noqa: E402
    convert_mnist_bigan,
    map_plan_params,
)
from imagecfgen_tpu.cli.common import load_bigan  # noqa: E402
from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config  # noqa: E402


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("conv")
    torch.manual_seed(0)
    E, G, D = ref_mnist.Encoder(), ref_mnist.Generator(), ref_mnist.Discriminator()
    # non-degenerate weights
    for m in (E, G, D):
        for p in m.parameters():
            torch.nn.init.normal_(p, 0, 0.05)
    src = tmp / "ref-bigan.tar"
    torch.save(
        {
            "E_state_dict": E.state_dict(),
            "G_state_dict": G.state_dict(),
            "D_state_dict": D.state_dict(),
        },
        str(src),
    )
    dst = tmp / "converted.tar"
    convert_mnist_bigan(str(src), str(dst))
    tree, scaler, meta = load_bigan(str(dst))
    return E.eval(), G.eval(), D.eval(), tree


def _inputs(b=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (b, 1, 28, 28)).astype(np.float32)
    z = rng.normal(0, 1, (b, 512, 1, 1)).astype(np.float32)
    attrs_t = {
        "digit": torch.from_numpy(np.eye(10, dtype=np.float32)[rng.integers(0, 10, b)]),
        "thickness": torch.from_numpy(rng.uniform(-1, 1, (b, 1)).astype(np.float32)),
        "intensity": torch.from_numpy(rng.uniform(-1, 1, (b, 1)).astype(np.float32)),
        "slant": torch.from_numpy(rng.uniform(-1, 1, (b, 1)).astype(np.float32)),
    }
    attrs_j = {
        "digit": jnp.asarray(attrs_t["digit"].numpy()),
        "thickness": jnp.asarray(attrs_t["thickness"].numpy()[:, 0]),
        "intensity": jnp.asarray(attrs_t["intensity"].numpy()[:, 0]),
        "slant": jnp.asarray(attrs_t["slant"].numpy()[:, 0]),
    }
    return x, z, attrs_t, attrs_j


def test_generator_parity(converted):
    _, G, _, tree = converted
    model = BiGAN(mnist_bigan_config())
    x, z, attrs_t, attrs_j = _inputs()
    with torch.no_grad():
        ref = G(torch.from_numpy(z), attrs_t).numpy()  # (B,1,28,28)
    ours = model.generator.apply(
        {"params": tree["params_G"]}, jnp.asarray(z.reshape(-1, 1, 1, 512)), attrs_j
    )
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert np.allclose(ref, ours_nchw, atol=2e-4), np.abs(ref - ours_nchw).max()


def test_encoder_parity(converted):
    E, _, _, tree = converted
    model = BiGAN(mnist_bigan_config())
    x, z, attrs_t, attrs_j = _inputs(seed=1)
    with torch.no_grad():
        ref = E(torch.from_numpy(x), attrs_t).numpy()  # (B,512,1,1)
    ours = model.encoder.apply(
        {"params": tree["params_E"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        attrs_j,
    )
    assert np.allclose(ref.reshape(ref.shape[0], -1), np.asarray(ours).reshape(ref.shape[0], -1),
                       atol=2e-4), "encoder outputs diverge"


def test_discriminator_parity(converted):
    _, _, D, tree = converted
    model = BiGAN(mnist_bigan_config())
    x, z, attrs_t, attrs_j = _inputs(seed=2)
    with torch.no_grad():
        ref = D(torch.from_numpy(x), torch.from_numpy(z), attrs_t).numpy()
    ours = model.discriminator.apply(
        {
            "params": tree["vars_D"]["params"],
            "batch_stats": tree["vars_D"]["batch_stats"],
        },
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(z.reshape(-1, 1, 1, 512)),
        attrs_j,
        train=False,
    )
    assert np.allclose(ref, np.asarray(ours), atol=5e-4), np.abs(ref - np.asarray(ours)).max()
