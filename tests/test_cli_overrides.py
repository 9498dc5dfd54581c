"""Execute reference-style command lines end-to-end: short aliases and
per-artifact file overrides (-m/-a/-c, --graph/--image-scm/--classifier,
positional attribute) must actually load the pointed-at files — parser
registration alone (test_cli_flag_parity) can't catch wiring bugs."""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cwd, script, *args, timeout=900):
    env = {**os.environ, "IMAGECFGEN_PLATFORM": "cpu"}
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *map(str, args)],
        capture_output=True, text=True, timeout=timeout, cwd=str(cwd), env=env,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-2500:]}"
    return proc.stdout


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    work = tmp_path_factory.mktemp("cli_overrides")
    _run(work, "create_train_dataset.py", "--synthetic", 64, "--scale", 4,
         "--workers", 1, "--out-dir", str(work))
    _run(work, "train_mnist_image_scm.py", "--data-dir", str(work),
         "--steps", 2, "--batch-size", 32, "--save-images-every", 0,
         "--output-path", str(work))
    _run(work, "train_mnist_attribute_scm.py", "--data-dir", str(work),
         "--steps", 20, "--output-path", str(work))
    _run(work, "train_mnist_clf.py", "--data-dir", str(work), "--epochs", 2,
         "--batch-size", 32, "--output-path", str(work))
    # scatter the artifacts into odd locations so the model-dir layout
    # cannot accidentally satisfy the overrides
    odd = work / "elsewhere"
    odd.mkdir()
    moved = {}
    for name in ("mnist-bigan.tar", "mnist-attribute-scm.tar", "mnist_clf.tar"):
        dst = odd / ("renamed-" + name)
        shutil.move(str(work / name), str(dst))
        moved[name] = dst
    return work, moved


@pytest.mark.slow
def test_generator_score_file_overrides(trained):
    work, moved = trained
    out = _run(work, "mnist_generator_score.py",
               "-m", moved["mnist-bigan.tar"],
               "-c", moved["mnist_clf.tar"],
               "-a", moved["mnist-attribute-scm.tar"],
               "--model-dir", str(work),  # empty of artifacts on purpose
               "--n", 64)
    assert "accuracy" in out


@pytest.mark.slow
def test_causal_graph_cf_reference_cli(trained):
    work, moved = trained
    # reference style: positional attribute + model-file flags
    _run(work, "causal_graph_cf.py", "thickness",
         "--graph", moved["mnist-attribute-scm.tar"],
         "--image-scm", moved["mnist-bigan.tar"],
         "--classifier", moved["mnist_clf.tar"],
         "--data-dir", str(work), "-n", 3, "--n-images", 2,
         "--output", str(work / "cgc.png"))
    assert (work / "cgc.png").exists()


@pytest.mark.slow
def test_gan_measured_cf_attribute_model_override(trained):
    work, moved = trained
    _run(work, "mnist_gan_measured_cf.py", "--data-dir", str(work),
         "--model-dir", str(work),
         "--image-model", moved["mnist-bigan.tar"],
         "--attribute-model", moved["mnist-attribute-scm.tar"],
         "--model-name", "RefName",
         "--limit", 2, "--workers", 1,
         "--output", str(work / "mcf.png"))
    assert (work / "mcf.png").exists()
