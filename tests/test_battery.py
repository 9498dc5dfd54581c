"""The full MNIST evaluation battery as one repeatable slow test chain.

Round 1 ran the 30-script battery once, by hand; nothing stopped the
eval scripts from rotting the way the reference's did (stale imports in
``mnist_gan_measured_cf.py:10``, ``mnist_cf_explain.py:4`` etc. —
SURVEY §4). This module re-runs the whole chain on tiny budgets, on CPU,
in one shared tmp directory: synth -> train every model family ->
every MNIST score/figure script. Run with ``pytest -m slow``.

Tests are ordered stages of one pipeline; each asserts rc=0 plus key
artifacts so a failure pinpoints the broken stage.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def work(tmp_path_factory):
    return tmp_path_factory.mktemp("battery")


def run(work, script, *args, timeout=900):
    # IMAGECFGEN_PLATFORM pins through jax.config inside the package; the
    # bare JAX_PLATFORMS env var is IGNORED by the axon TPU plugin, so with
    # it alone these "CPU" subprocesses silently ran on the TPU
    env = {**os.environ, "IMAGECFGEN_PLATFORM": "cpu"}
    env.pop("XLA_FLAGS", None)  # single virtual device is fine here
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *map(str, args)],
        capture_output=True, text=True, timeout=timeout, cwd=str(work), env=env,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-3000:]}"
    return proc


def test_a_synthesize(work):
    run(work, "create_train_dataset.py", "--synthetic", 64, "--scale", 4,
        "--workers", 1, "--out-dir", str(work))
    run(work, "create_test_dataset.py", "--synthetic", 32, "--scale", 4,
        "--workers", 1, "--out-dir", str(work))
    assert np.load(work / "mnist-x-train.npy").shape == (64, 28, 28)
    assert np.load(work / "mnist-a-test.npy").shape == (32, 13)


def test_b_train_models(work):
    run(work, "train_mnist_image_scm.py", "--data-dir", str(work),
        "--steps", 2, "--batch-size", 32, "--save-images-every", 2)
    assert (work / "mnist-bigan.tar").exists()
    run(work, "train_mnist_attribute_scm.py", "--data-dir", str(work),
        "--steps", 30)
    assert (work / "mnist-attribute-scm.tar").exists()
    run(work, "train_mnist_clf.py", "--data-dir", str(work), "--epochs", 2)
    assert (work / "mnist_clf.tar").exists()
    run(work, "train_mnist_vae.py", "--data-dir", str(work), "--steps", 2,
        "--batch-size", 32)
    assert (work / "mnist-vae.tar").exists()
    run(work, "train_morphomnist_oracles.py", "--data-dir", str(work),
        "--epochs", 1)
    assert (work / "oracle-0.tar").exists()
    run(work, "train_morphomnist_ae.py", "--data-dir", str(work),
        "--epochs", 1)
    assert (work / "ae-all.tar").exists()
    run(work, "finetune_mnist_bigan.py", "--data-dir", str(work),
        "--steps", 1, "--batch-size", 32)


def test_c_counterfactual_figures(work):
    run(work, "mnist_gan_counterfactuals.py", "--data-dir", str(work),
        "--model-dir", str(work), "--n-images", 4)
    run(work, "mnist_reconstructions.py", "--data-dir", str(work),
        "--n-images", 4)
    run(work, "mnist_vae_counterfactuals.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 2, "--scale", 4, "--workers", 1)
    run(work, "causal_graph_cf.py", "--data-dir", str(work),
        "--model-dir", str(work), "--n-images", 2, "--n-points", 5)
    run(work, "display_thickness.py", "--data-dir", str(work),
        "--model-dir", str(work), "--n-points", 5)
    run(work, "uncertainty_evolution.py", "--data-dir", str(work),
        "--model-dir", str(work), "--n-points", 5, "--contrastive-steps", 5)
    run(work, "cf_automatic_mix.py", "--data-dir", str(work),
        "--model-dir", str(work), "--sample-points", 5)
    run(work, "mnist_mix_vae_gui.py", "--data-dir", str(work),
        "--model-dir", str(work), "--headless")


def test_d_scores(work):
    run(work, "mnist_bigan_score.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 8, "--mc-rounds", 1)
    # hard-battery compound intervention path (digit swap + held-out
    # continuous shifts; VERDICT r3 item 9)
    run(work, "mnist_bigan_score.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 8, "--mc-rounds", 1,
        "--held-out-shift", 1.5, 32, 0.4)
    run(work, "mnist_vae_score.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 8)
    run(work, "mnist_vae_score.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 8,
        "--held-out-shift", 1.5, 32, 0.4)
    run(work, "mnist_generator_score.py", "--model-dir", str(work), "--n", 8)
    run(work, "mnist_vae_generator_score.py", "--model-dir", str(work),
        "--n", 8)
    run(work, "mnist_gan_measured_cf.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 2, "--workers", 1)
    run(work, "mnist_vae_measured_cf.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 2, "--workers", 1)


def test_e_explainer_benchmarks(work):
    run(work, "mnist_cf_explain.py", "--data-dir", str(work),
        "--model-dir", str(work), "--sample-points", 5, "--steps", 3)
    run(work, "mnist_cf_comparisons.py", "--data-dir", str(work),
        "--model-dir", str(work), "--n-images", 2, "--steps", 3)
    run(work, "make_mnist_cf_matrix.py", "--data-dir", str(work),
        "--model-dir", str(work), "--per-digit", 1, "--sample-points", 5,
        "--output", str(work / "cf_matrix.pkl"))
    run(work, "show_cf_matrix.py", "--matrix", str(work / "cf_matrix.pkl"))
    run(work, "morphomnist_attribute_shap.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 4, "--n-background", 4,
        "--n-mc", 2, "--n-steps", 2)


def test_f_csv_schemas(work):
    """cf-metrics + oracle-scores CSVs carry the pixel-baseline columns
    (produced offline by the built-in Wachter-CF / CEM reimplementation)
    so downstream comparisons stay drop-in (reference
    morphomnist_cf_metrics.py:120-156, mnist_oracle_scores.py:122-139)."""
    import pandas as pd

    run(work, "morphomnist_cf_metrics.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 4, "--steps", 3,
        "--output", str(work / "cf_metrics.csv"))
    df = pd.read_csv(work / "cf_metrics.csv")
    for m in ("bigan", "vae", "bigan_agnostic", "vae_agnostic", "cf", "pn"):
        for col in (f"{m}_label", f"l1_{m}", f"o_rec_{m}", f"t_rec_{m}",
                    f"all_rec_{m}"):
            assert col in df.columns, col
    # the built-in baselines populate the columns with real values
    assert df["cf_label"].notna().all()
    assert df["pn_label"].notna().all()
    assert df["l1_cf"].notna().all()

    run(work, "mnist_oracle_scores.py", "--data-dir", str(work),
        "--model-dir", str(work), "--limit", 4, "--steps", 3,
        "--output", str(work / "oracle_scores.csv"))
    df = pd.read_csv(work / "oracle_scores.csv")
    for m in ("bigan", "cf", "pn"):
        assert f"{m}_label" in df.columns
        assert f"{m}_js" in df.columns


def test_g_audio_chain(work):
    """AudioMNIST slice on the synthetic stand-in (zip path is covered by
    tests/test_real_data_fixtures.py)."""
    run(work, "train_audio_mnist_bigan.py", "--steps", 1, "--d", 8,
        "--batch-size", 16, timeout=1800)
    run(work, "train_audio_mnist_attribute_scm.py", "--steps", 20)
    run(work, "train_audio_mnist_clf.py", "--attribute", "digit",
        "--epochs", 1, "--width", 0.125, timeout=1800)
    run(work, "audiomnist_generate.py", "--num-samples", 2,
        "--model-dir", str(work), timeout=1800)


def test_h_whale_chain(work):
    run(work, "train_whale_bigan.py", "--steps", 1, "--d", 4,
        "--batch-size", 8, timeout=1800)
    run(work, "train_whale_clf.py", "--epochs", 1, "--width", 0.0625,
        timeout=1800)
    run(work, "whale_generator_score.py", "--n", 4, "--model-dir", str(work),
        timeout=1800)
