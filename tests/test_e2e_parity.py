"""End-to-end eval-script parity on converted checkpoints (VERDICT r2
item 2).

Round 2 proved *model-output* parity (converted torch weights give
identical E/G/D/clf outputs). This upgrades to *pipeline-level metric
parity*: train small reference models with the reference's own torch
code, score them with the reference's own scoring scripts (run verbatim
via runpy), convert the checkpoints, score with this framework's
scripts on the identical data, and assert the metrics agree.

Remaining randomness across the two pipelines (z draws in the generator
score; which resampled digits the CF score intervenes with — equal in
law, different draws) bounds agreement at binomial noise, so the
assertion tolerance is 0.05 on accuracies over >=512 samples; every
deterministic stage (encoder, generator, classifier, attribute scaling)
is shared bit-for-bit through the converted weights, so a systematic
pipeline deviation (e.g. a wrong attr scaling) shifts the score far
beyond that.

The reference's attribute graph is pyro-pickled; its only role in
``mnist_bigan_score`` is resampling digits from the empirical marginal,
so the fixture saves a pickle-compatible stand-in graph with exactly
that law (the converted-SCM side uses the same empirical MLE — equal
resampling law on both sides; full attribute-SCM ingestion parity is
covered by test_attribute_scm_convert.py).
"""
import contextlib
import io
import os
import re
import runpy
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("IMAGECFGEN_REFERENCE", "/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference sources unavailable"),
]

STANDIN_MODULE = "_e2e_graph_standin"
STANDIN_SRC = '''
import torch


class EmpiricalDigitGraph:
    """Pickle-compatible stand-in for the pyro attribute graph: its only
    use inside mnist_bigan_score.py is drawing fresh digits from the
    empirical marginal (the digit node is a root CategoricalCM)."""

    def __init__(self, probs):
        self.probs = torch.as_tensor(probs, dtype=torch.float32)

    def sample(self, obs_in=None, n=None):
        if n is None:
            n = len(next(iter(obs_in.values())))
        digit = torch.multinomial(self.probs, n, replacement=True)
        out = dict(obs_in or {})
        out["digit"] = digit
        return out


class EmpiricalJointGraph:
    """Stand-in whose ``sample(n=...)`` draws whole attribute rows from the
    empirical joint (used by mnist_vae_generator_score.py, which needs all
    four attributes, not just a digit resample)."""

    def __init__(self, rows):
        self.rows = {k: torch.as_tensor(v) for k, v in rows.items()}

    def sample(self, obs_in=None, n=None):
        if n is None:
            n = len(next(iter(obs_in.values())))
        idx = torch.randint(0, len(self.rows["digit"]), (n,))
        out = dict(obs_in or {})
        for k, v in self.rows.items():
            out[k] = v[idx]
        return out
'''


def _run_reference_script(script, argv, cwd):
    """Execute a reference script verbatim with patched argv/cwd; return
    captured stdout. torch>=2.6 defaults torch.load to weights_only=True,
    which rejects the whole-module pickles the reference era wrote; the
    fixture checkpoints are our own, so restore the old default for the
    duration of the run."""
    import functools

    import torch

    old_argv, old_cwd = sys.argv, os.getcwd()
    old_load = torch.load
    buf = io.StringIO()
    try:
        os.chdir(cwd)
        sys.argv = [script] + argv
        torch.load = functools.partial(old_load, weights_only=False)
        with contextlib.redirect_stdout(buf):
            runpy.run_path(os.path.join(REFERENCE, script), run_name="__main__")
    finally:
        torch.load = old_load
        sys.argv, _ = old_argv, os.chdir(old_cwd)
    return buf.getvalue()


def _parse_acc(text, label):
    m = re.search(re.escape(label) + r"[^0-9-]*([0-9.]+)", text)
    assert m, f"could not find {label!r} in output:\n{text[-2000:]}"
    return float(m.group(1))


@pytest.fixture(scope="module")
def pipelines(tmp_path_factory):
    """Synthesize data, train reference torch models, save reference-format
    checkpoints, convert them, fit our attribute SCM."""
    import torch

    from tools.convert_reference_checkpoint import _install_reference_shims

    _install_reference_shims(REFERENCE)
    data = tmp_path_factory.mktemp("e2e_data")
    models = tmp_path_factory.mktemp("e2e_models")

    env = {**os.environ, "IMAGECFGEN_PLATFORM": "cpu",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    for script, n in (("create_train_dataset.py", 1024),
                      ("create_test_dataset.py", 512)):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, script), "--synthetic", str(n),
             "--scale", "4", "--out-dir", str(data)],
            capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]

    x_train = np.load(data / "mnist-x-train.npy")
    a_train = np.load(data / "mnist-a-train.npy")

    # ---- reference torch training (their own code) ----------------------
    torch.manual_seed(0)
    from image_scms import mnist as ref_mnist  # noqa: E402

    a_dict = {
        "digit": torch.from_numpy(a_train[:, :10]).float(),
        "thickness": torch.from_numpy(a_train[:, 10:11]).float(),
        "intensity": torch.from_numpy(a_train[:, 11:12]).float(),
        "slant": torch.from_numpy(a_train[:, 12:13]).float(),
    }
    xt = torch.from_numpy(x_train).float()
    with contextlib.redirect_stdout(sys.stderr):
        E, G, D, _, _ = ref_mnist.train(
            xt, a_dict, x_test=xt[:8], a_test={k: v[:8] for k, v in a_dict.items()},
            n_epochs=3, batch_size=64, save_images_every=None, device="cpu",
        )
    torch.save({"E": E, "G": G, "D": D}, models / "mnist-bigan.tar")

    from classifiers import mnist as ref_clf_mod  # noqa: E402

    torch.manual_seed(1)
    with contextlib.redirect_stdout(sys.stderr):
        clf = ref_clf_mod.train(str(data), epochs=4, batch_size=128)
    torch.save({"clf": clf}, models / "mnist_clf.tar")

    # stand-in graph with the empirical digit marginal (see module docstring)
    standin_path = models / (STANDIN_MODULE + ".py")
    standin_path.write_text(STANDIN_SRC)
    sys.path.insert(0, str(models))
    try:
        mod = __import__(STANDIN_MODULE)
        counts = a_train[:, :10].sum(axis=0)
        graph = mod.EmpiricalDigitGraph(counts / counts.sum())
        torch.save({"graph": graph}, models / "mnist-attribute-scm-ref.tar")
    finally:
        pass  # keep on path: unpickling inside the reference script needs it

    # ---- convert to our format + fit our SCM ----------------------------
    for kind, inp, out, extra in (
        ("mnist-bigan", "mnist-bigan.tar", "mnist-bigan-ours.tar",
         ["--data-dir", str(data)]),
        ("mnist-clf", "mnist_clf.tar", "mnist_clf-ours.tar", []),
    ):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "convert_reference_checkpoint.py"),
             "--kind", kind, "--input", str(models / inp),
             "--output", str(models / out)] + extra,
            capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
    ours = models / "ours"
    ours.mkdir()
    os.rename(models / "mnist-bigan-ours.tar", ours / "mnist-bigan.tar")
    os.rename(models / "mnist_clf-ours.tar", ours / "mnist_clf.tar")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_mnist_attribute_scm.py"),
         "--data-dir", str(data), "--steps", "200", "--output-path", str(ours)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return {"data": data, "models": models, "ours": ours, "env": env}


def _our_script(script, argv, env):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + argv,
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_generator_score_parity(pipelines):
    p = pipelines
    ref_out = _run_reference_script(
        "mnist_generator_score.py",
        ["--data-dir", str(p["data"]),
         "-m", str(p["models"] / "mnist-bigan.tar"),
         "-c", str(p["models"] / "mnist_clf.tar")],
        cwd=str(p["models"]))
    ref_acc = _parse_acc(ref_out, "Digit accuracy (generated)")

    our_out = _our_script(
        "mnist_generator_score.py",
        ["--model-dir", str(p["ours"]), "--data-dir", str(p["data"])],
        p["env"])
    our_acc = _parse_acc(our_out, "generated-sample digit accuracy")
    assert abs(ref_acc - our_acc) < 0.05, (ref_acc, our_acc)


def test_bigan_cf_score_parity(pipelines):
    p = pipelines
    ref_out = _run_reference_script(
        "mnist_bigan_score.py",
        ["--data-dir", str(p["data"]),
         "-m", str(p["models"] / "mnist-bigan.tar"),
         "-a", str(p["models"] / "mnist-attribute-scm-ref.tar"),
         "-c", str(p["models"] / "mnist_clf.tar")],
        cwd=str(p["models"]))
    ref_acc = _parse_acc(ref_out, "Digit accuracy (test data w/ interventions)")

    our_out = _our_script(
        "mnist_bigan_score.py",
        ["--data-dir", str(p["data"]), "--model-dir", str(p["ours"]),
         "--limit", "512"],
        p["env"])
    our_acc = _parse_acc(our_out, "cf digit accuracy")
    assert abs(ref_acc - our_acc) < 0.05, (ref_acc, our_acc)


@pytest.fixture(scope="module")
def vae_pipeline(pipelines, tmp_path_factory):
    """Train the reference VAE with its own torch code (verbatim under the
    pyro shims — ``_CondTransformedDist`` makes ``MorphoMNISTVAE.elbo`` run
    as written, ``deepscm_vae/mnist.py:121-133``), convert the checkpoint,
    and build the joint-law stand-in graph the generator score needs."""
    import torch

    p = pipelines
    data, models, ours, env = p["data"], p["models"], p["ours"], p["env"]

    x_train = np.load(data / "mnist-x-train.npy")
    a_train = np.load(data / "mnist-a-train.npy")
    a_dict = {
        "digit": torch.from_numpy(a_train[:, :10]).float(),
        "thickness": torch.from_numpy(a_train[:, 10:11]).float(),
        "intensity": torch.from_numpy(a_train[:, 11:12]).float(),
        "slant": torch.from_numpy(a_train[:, 12:13]).float(),
    }
    xt = torch.from_numpy(x_train).float()

    torch.manual_seed(2)
    from deepscm_vae import mnist as ref_vae_mod  # noqa: E402

    with contextlib.redirect_stdout(sys.stderr):
        vae, _ = ref_vae_mod.train(
            xt, a_dict, x_test=xt[:8],
            a_test={k: v[:8] for k, v in a_dict.items()},
            n_epochs=3, batch_size=64, save_images_every=None, device="cpu",
        )
    torch.save({"vae": vae}, models / "mnist-vae.tar")

    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "convert_reference_checkpoint.py"),
         "--kind", "mnist-vae", "--input", str(models / "mnist-vae.tar"),
         "--output", str(ours / "mnist-vae.tar"), "--data-dir", str(data)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]

    # joint-law stand-in graph (digit as int index, continuous raw)
    mod = __import__(STANDIN_MODULE)
    rows = {
        "digit": np.argmax(a_train[:, :10], axis=1).astype(np.int64),
        "thickness": a_train[:, 10:11].astype(np.float32),
        "intensity": a_train[:, 11:12].astype(np.float32),
        "slant": a_train[:, 12:13].astype(np.float32),
    }
    graph = mod.EmpiricalJointGraph(rows)
    torch.save({"graph": graph}, models / "mnist-attr-joint-ref.tar")
    return p


def test_vae_cf_score_parity(vae_pipeline):
    """mnist_vae_score.py run verbatim on the reference VAE vs our script
    on the converted checkpoint (VERDICT r3 item 5). The z draw differs in
    law (the reference encoder.sample scales noise by the VARIANCE —
    deepscm_vae/mnist.py:58-61 — ours scores from the posterior mean), so
    agreement is bounded by that stochasticity plus binomial noise."""
    p = vae_pipeline
    ref_out = _run_reference_script(
        "mnist_vae_score.py",
        ["--data-dir", str(p["data"]),
         "-m", str(p["models"] / "mnist-vae.tar"),
         "-a", str(p["models"] / "mnist-attribute-scm-ref.tar"),
         "-c", str(p["models"] / "mnist_clf.tar")],
        cwd=str(p["models"]))
    ref_acc = _parse_acc(ref_out, "Digit accuracy (test data w/ interventions)")

    our_out = _our_script(
        "mnist_vae_score.py",
        ["--data-dir", str(p["data"]), "--model-dir", str(p["ours"]),
         "--limit", "512"],
        p["env"])
    our_acc = _parse_acc(our_out, "vae cf digit accuracy")
    assert abs(ref_acc - our_acc) < 0.06, (ref_acc, our_acc)


def test_vae_generator_score_parity(vae_pipeline):
    """mnist_vae_generator_score.py verbatim vs ours (VERDICT r3 item 5).
    Both sides draw (z, attrs) fresh — the reference from the joint-law
    stand-in, ours from the converted attribute SCM (same empirical law) —
    so the comparison is between two Monte-Carlo estimates of the same
    generated-digit accuracy through the bit-identical decoder+classifier."""
    p = vae_pipeline
    ref_out = _run_reference_script(
        "mnist_vae_generator_score.py",
        ["--data-dir", str(p["data"]),
         "-m", str(p["models"] / "mnist-vae.tar"),
         "-a", str(p["models"] / "mnist-attr-joint-ref.tar"),
         "-c", str(p["models"] / "mnist_clf.tar"),
         "-n", "2048"],
        cwd=str(p["models"]))
    ref_acc = _parse_acc(ref_out, "Digit accuracy (generated)")

    our_out = _our_script(
        "mnist_vae_generator_score.py",
        ["--model-dir", str(p["ours"]), "--data-dir", str(p["data"]),
         "-n", "2048"],
        p["env"])
    our_acc = _parse_acc(our_out, "vae generated-sample digit accuracy")
    assert abs(ref_acc - our_acc) < 0.06, (ref_acc, our_acc)


def _install_skimage_shim():
    """The reference's morphometry imports scikit-image, absent from this
    image. Back the two entry points it uses with our reimplementations so
    the reference measurement code runs otherwise verbatim. NOTE the shared
    oracle: both sides then use OUR medial_axis/pyramid — this test checks
    every piece of measurement glue AROUND the skeleton primitive
    (thickness/intensity/slant formulas, scaling, moments), not the
    primitive itself (VERDICT r3 missing item 5's caveat stands until
    scikit-image golden vectors can be captured)."""
    import types

    from imagecfgen_tpu.morphomnist import _skeletonize
    from imagecfgen_tpu.morphomnist import morpho as our_morpho

    sk = types.ModuleType("skimage")
    sk_m = types.ModuleType("skimage.morphology")
    sk_t = types.ModuleType("skimage.transform")
    sk_m.medial_axis = _skeletonize.medial_axis
    sk_t.pyramid_expand = (
        lambda image, upscale=2, order=3, multichannel=False, **kw:
        our_morpho.pyramid_expand(image, upscale, order))
    sk.morphology, sk.transform = sk_m, sk_t
    for name, m in (("skimage", sk), ("skimage.morphology", sk_m),
                    ("skimage.transform", sk_t)):
        sys.modules.setdefault(name, m)


def test_measured_cf_measurement_parity(pipelines):
    """Measurement-kernel parity for the measured-CF pipeline (VERDICT r3
    item 5). The reference's mnist_gan_measured_cf.py cannot run verbatim
    end-to-end: it crashes upstream (imports a GroundTruthCausalGraph that
    does not exist in /root/reference/attribute_scms) — so this pins the
    part that CAN be compared: its measurement kernel
    ``extract_observed_attributes`` (mnist_gan_measured_cf.py:14-25),
    loaded from the reference source and run on the same images as our
    ``metrics.measured.measure_attributes``.

    Known definitional deviations this asserts around:
    - slant: the reference reports the raw horizontal shear (= tan(angle))
      of the ORIGINAL image's moments; ours reports arctan(-shear) of the
      hires image (the angle, which is what the SetSlant target is).
      tan(ours) must match theirs.
    - thickness: same formula; only binarisation edge effects may differ
      (our pipeline clips cubic overshoot before rescaling, theirs does
      not), so the tolerance is loose-ish but far below attribute spread.
    - intensity: identical median-bright-pixel rule — must match exactly.
    """
    import matplotlib

    matplotlib.use("Agg")
    _install_skimage_shim()

    # the script's own `from attribute_scms.mnist import
    # GroundTruthCausalGraph` names a class that does not exist in the
    # reference tree (the upstream crash above); inject a placeholder so
    # the module-level code past the import can run — only __main__ would
    # ever touch it.
    import attribute_scms.mnist as ref_attr_mnist

    if not hasattr(ref_attr_mnist, "GroundTruthCausalGraph"):
        ref_attr_mnist.GroundTruthCausalGraph = type(
            "GroundTruthCausalGraph", (), {})

    p = pipelines
    old_argv = sys.argv
    sys.argv = ["mnist_gan_measured_cf.py"]
    try:
        g = runpy.run_path(
            os.path.join(REFERENCE, "mnist_gan_measured_cf.py"),
            run_name="ref_measured_cf")
    finally:
        sys.argv = old_argv
    extract = g["extract_observed_attributes"]

    from imagecfgen_tpu.metrics.measured import measure_attributes

    x_test = np.load(p["data"] / "mnist-x-test.npy").astype(np.float64)[:24]
    ref_vals = np.stack([extract(img) for img in x_test])
    our_vals = measure_attributes(x_test, scale=16)

    d_thick = np.abs(ref_vals[:, 0] - our_vals[:, 0])
    assert np.median(d_thick) < 0.05 and d_thick.max() < 0.2, d_thick
    assert np.abs(ref_vals[:, 1] - our_vals[:, 1]).max() < 1e-9
    d_slant = np.abs(ref_vals[:, 2] - np.tan(our_vals[:, 2]))
    assert np.median(d_slant) < 0.02 and d_slant.max() < 0.1, d_slant
