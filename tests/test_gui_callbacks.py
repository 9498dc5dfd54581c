"""Headless exercise of the interactive slider-callback path (VERDICT r2
item 9): ``mnist_mix_vae_gui.py``'s matplotlib ``Slider.on_changed``
callbacks have to re-solve the jitted ``sample_cf`` + decode chain and
push the new image into the displayed artist.

The script is run verbatim via runpy under the Agg backend (``plt.show``
is a no-op there); its module globals expose the sliders / image artist /
``cf_image`` closure, so the test drives ``set_val`` exactly the way a
real slider drag does and asserts the rendered array updates to the
freshly-solved counterfactual.
"""
import os
import runpy
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gui_dirs(tmp_path_factory):
    """Tiny dataset + untrained-but-valid checkpoints for the GUI script."""
    from imagecfgen_tpu.cli.common import save_attribute_scm, save_bigan
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.scm.mnist import MNISTAttributeSCM
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    d = tmp_path_factory.mktemp("gui")
    rng = np.random.default_rng(0)
    n = 64
    t = rng.gamma(10, 1 / 5, n).astype(np.float32) + 0.5
    i = (191 / (1 + np.exp(-(2 * t - 5))) + 64).astype(np.float32)
    s = (np.pi * rng.normal(0, 0.1, n)).astype(np.float32)
    digit = rng.integers(0, 10, n)
    x = rng.uniform(0, 255, (n, 28, 28)).astype(np.float32)
    a = np.concatenate(
        [np.eye(10, dtype=np.float32)[digit], t[:, None], i[:, None], s[:, None]],
        axis=1,
    )
    np.save(d / "mnist-x-train.npy", x)
    np.save(d / "mnist-a-train.npy", a)

    attrs = {"digit": np.eye(10, dtype=np.float32)[digit],
             "thickness": t, "intensity": i, "slant": s}
    scaler = AttributeScaler.fit(MNIST_SPEC, attrs)
    trainer = GANTrainer(BiGAN(mnist_bigan_config()), GANTrainConfig(batch_size=16))
    state = trainer.init_state(jax.random.PRNGKey(0))
    save_bigan(str(d / "mnist-bigan.tar"), state, scaler)
    scm = MNISTAttributeSCM.fit(
        {"thickness": t, "intensity": i, "slant": s, "digit": digit},
        steps=5, batch_size=n,
    )
    save_attribute_scm(str(d / "mnist-attribute-scm.tar"), scm)
    return d


def test_mix_gui_slider_callback_updates_image(gui_dirs, monkeypatch):
    import matplotlib

    matplotlib.use("Agg", force=True)
    import imagecfgen_tpu.cli.common as common

    monkeypatch.setattr(common, "clean_exit", lambda *a, **k: None)
    monkeypatch.setattr(common, "install_cli_excepthook", lambda *a, **k: None)
    monkeypatch.setattr(sys, "argv", [
        "mnist_mix_vae_gui.py", "--data-dir", str(gui_dirs),
        "--model-dir", str(gui_dirs), "--image-index", "1",
    ])
    g = runpy.run_path(os.path.join(REPO, "mnist_mix_vae_gui.py"),
                       run_name="__main__")

    sliders, im, cf_image = g["sliders"], g["im"], g["cf_image"]
    assert set(sliders) == {"thickness", "intensity", "slant", "mix"}
    before = np.array(im.get_array(), copy=True)

    # a real drag: set_val fires on_changed -> update -> engine CF -> set_data
    t_hi = sliders["thickness"].valmax
    sliders["thickness"].set_val(t_hi)
    after = np.array(im.get_array(), copy=True)
    assert not np.allclose(before, after), "callback did not update the image"

    expected = cf_image(t_hi, sliders["intensity"].val, sliders["slant"].val)
    assert np.allclose(after, expected, atol=1e-6), (
        "rendered array is not the freshly solved counterfactual")

    # move a second slider; the image must change again and track cf_image
    s_lo = sliders["slant"].valmin
    sliders["slant"].set_val(s_lo)
    after2 = np.array(im.get_array(), copy=True)
    assert not np.allclose(after, after2)
    assert np.allclose(
        after2, cf_image(t_hi, sliders["intensity"].val, s_lo), atol=1e-6)

    # the digit-mix slider (reference mnist_mix_vae_gui.py semantics) takes
    # over rendering when nonzero and must track mix_image
    mix_image = g["mix_image"]
    sliders["mix"].set_val(0.75)
    after3 = np.array(im.get_array(), copy=True)
    assert not np.allclose(after2, after3)
    assert np.allclose(after3, mix_image(0.75), atol=1e-6)
