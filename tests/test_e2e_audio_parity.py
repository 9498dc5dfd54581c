"""Audio end-to-end parity against the reference pipeline (VERDICT r2
item 2, audio leg).

Two levels, both driving the reference's own code verbatim on a
constructed full-grid AudioMNIST archive (the loader hard-codes the
60x10x50 grid, ``image_scms/audio_mnist.py:69-76``):

1. **Loader head-to-head** — the reference ``AudioMNISTData`` runs as
   written (librosa/torchaudio replaced by *functional* stand-ins: the
   reference's ``res_type="scipy"`` is FFT-domain ``scipy.signal.resample``
   — the stand-in calls the real scipy — and
   ``torchaudio.transforms.Spectrogram`` is the torch.stft recipe pinned
   by tests/test_stft.py) and its raw arrays, metadata cleanup, one-hot /
   age-bin codecs, split filtering, and log-spectrogram batches are
   asserted against ours.

2. **Score-script parity** — ``audiomnist_bigan_score.py`` runs verbatim
   (runpy) on reference-format checkpoints, our converter ingests the
   same checkpoints, and our scorer must agree on the digit-CF accuracy.
   The BiGAN width is narrowed (the ``d=64`` constructor default -> 4 —
   the only deviation from verbatim; full-width torch forwards over the
   5400-sample validation grid are infeasible on this 1-core host) and
   the models are constructed for a decisive score: E is zeroed, G is
   trained (z=0) to emit a per-digit constant image c_k, and the
   classifier is the reference ``AudioMNISTClassifier`` architecture with
   crafted weights implementing a nearest-prototype readout (averaging
   carrier channel -> one feature -> tangent-line logits, so
   argmax_k(u*u_k - u_k^2/2) = nearest prototype). A correct pipeline on
   both sides scores ~1.0; any deviation in one-hot ordering, the
   resample-until-different CF loop, split selection, or accuracy
   accounting collapses the score.
"""
import io
import json
import os
import sys
import types
import zipfile

import numpy as np
import pytest

from test_e2e_parity import REFERENCE, REPO, _parse_acc, _run_reference_script

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference sources unavailable"),
]

N_SUBJECTS, N_DIGITS, N_RUNS = 60, 10, 50  # image_scms/audio_mnist.py:69-76
SR_HI_SUBJECTS = (1, 2)  # stored at 48 kHz to exercise the resample path

# 13 cleaned countries / 15 cleaned accents so the fitted OneHotEncoder
# widths equal the reference's fixed ATTRIBUTE_DIMS (audio_mnist.py:23-30);
# includes the real metadata quirks (Spanien, German/Spanish, age 245)
ORIGINS = ["Madrid, Spanien", "Berlin, Germany", "Paris, France",
           "Rome, Italy", "Beijing, China", "Rio, Brazil", "Cairo, Egypt",
           "Delhi, India", "Tokyo, Japan", "Nairobi, Kenya", "Oslo, Norway",
           "Ankara, Turkey", "Boston, Usa"]
ACCENTS = ["German/Spanish", "german", "spanish", "french", "italian",
           "chinese", "portuguese", "arabic", "hindi", "japanese",
           "swahili", "norwegian", "turkish", "english", "levant", "other"]
AGES = [21, 23, 26, 29, 31, 34, 37, 39, 245, 30]  # 245 -> 28 cleanup


def _install_functional_stubs():
    """librosa/torchaudio are absent from this image; install *functional*
    stand-ins (mutating any inert shim modules already present) so the
    reference audio pipeline executes for real. sklearn>=1.4 dropped
    ``OneHotEncoder(sparse=)``; a compat subclass restores the reference
    era's spelling."""
    import inspect

    import scipy.signal as ss
    import sklearn.preprocessing as skp
    import torch

    def module(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    # --- librosa.core.resample(res_type="scipy") == scipy.signal.resample
    # with n = ceil(len * target/orig), cast back to y.dtype, identity when
    # rates match (librosa core/audio.py semantics)
    def resample(y=None, orig_sr=None, target_sr=None,
                 res_type="kaiser_best", **kw):
        assert res_type == "scipy", f"stand-in only covers 'scipy', got {res_type!r}"
        if orig_sr == target_sr:
            return y
        n = int(np.ceil(y.shape[-1] * target_sr / orig_sr))
        return np.asarray(ss.resample(y, n, axis=-1), dtype=y.dtype)

    lib, core = module("librosa"), module("librosa.core")
    core.resample = resample
    lib.core = core
    lib.resample = resample

    # --- torchaudio.transforms.Spectrogram == F.pad -> torch.stft(center,
    # reflect, hann(win)) -> |.|^power (recipe pinned by tests/test_stft.py)
    class Spectrogram(torch.nn.Module):
        def __init__(self, n_fft=400, win_length=None, hop_length=None,
                     pad=0, power=2.0, **kw):
            super().__init__()
            self.n_fft, self.pad, self.power = n_fft, pad, power
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2
            self.register_buffer("window", torch.hann_window(self.win_length))

        def forward(self, x):
            if self.pad:
                x = torch.nn.functional.pad(x, (self.pad, self.pad))
            s = torch.stft(x, self.n_fft, hop_length=self.hop_length,
                           win_length=self.win_length, window=self.window,
                           center=True, pad_mode="reflect", onesided=True,
                           return_complex=True)
            return s.abs() ** self.power

    class GriffinLim(torch.nn.Module):  # constructed but unused by scorers
        def __init__(self, **kw):
            super().__init__()

        def forward(self, x):
            raise NotImplementedError("GriffinLim stand-in is inert")

    ta, tat = module("torchaudio"), module("torchaudio.transforms")
    tat.Spectrogram, tat.GriffinLim = Spectrogram, GriffinLim
    ta.transforms = tat

    if "sparse" not in inspect.signature(skp.OneHotEncoder.__init__).parameters \
            and not getattr(skp.OneHotEncoder, "_sparse_compat", False):
        base = skp.OneHotEncoder

        # a factory, not a subclass: sklearn rejects estimator classes
        # with varargs constructors, and the reference only ever calls
        # ``OneHotEncoder(sparse=False).fit(...)``
        def OneHotEncoder(*a, sparse=None, **kw):
            if sparse is not None:
                kw["sparse_output"] = sparse
            return base(*a, **kw)

        OneHotEncoder._sparse_compat = True
        skp.OneHotEncoder = OneHotEncoder


def _wav_bytes(sr, subject, dig, run):
    from scipy.io import wavfile

    rng = np.random.default_rng(subject * 100_000 + dig * 1_000 + run)
    n = int(0.1 * sr)
    t = np.arange(n) / sr
    f = 300.0 + 60 * dig + 2 * (subject % 5)
    # noise floor keeps every log-spect bin far above f32 STFT rounding,
    # so the cross-framework log-domain comparison stays tight
    x = 0.3 * np.sin(2 * np.pi * f * t) + 0.01 * rng.normal(size=n)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (x * 32767).astype(np.int16))
    return buf.getvalue()


@pytest.fixture(scope="module")
def audio_zip60(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("amnist60")
    meta = {}
    for i in range(1, N_SUBJECTS + 1):
        name = f"0{i}"[-2:]
        meta[name] = {
            "origin": ORIGINS[i % len(ORIGINS)],
            "accent": ACCENTS[i % len(ACCENTS)],
            "age": AGES[i % len(AGES)],
            "native speaker": "yes" if i % 2 else "no",
            "gender": "female" if (i // 2) % 2 else "male",
        }
    path = tmp / "audio_mnist60.zip"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("data/audioMNIST_meta.txt", json.dumps(meta))
        for i in range(1, N_SUBJECTS + 1):
            name = f"0{i}"[-2:]
            sr = 48000 if i in SR_HI_SUBJECTS else 8000
            for dig in range(N_DIGITS):
                for run in range(N_RUNS):
                    zf.writestr(f"data/{name}/{dig}_{name}_{run}.wav",
                                _wav_bytes(sr, i, dig, run))
    return str(path)


@pytest.fixture(scope="module")
def ref_audio():
    """The reference image_scms.audio_mnist module, imported for real
    under the functional stand-ins."""
    from tools.convert_reference_checkpoint import _install_reference_shims

    _install_functional_stubs()  # before the inert shims, so these win
    _install_reference_shims(REFERENCE)
    import image_scms.audio_mnist as ref_am  # noqa: E402

    return ref_am


# --------------------------------------------------------------- loader


def test_loader_head_to_head(audio_zip60, ref_audio):
    from imagecfgen_tpu.data.audio_mnist import VALIDATION_RUNS, AudioMNISTData

    ref_data = ref_audio.AudioMNISTData(audio_zip60)
    ours = AudioMNISTData(path_to_zip=audio_zip60)

    ra, oa = ref_data.data["audio"], ours.raw["audio"]
    assert ra.shape == oa.shape == (N_SUBJECTS * N_DIGITS * N_RUNS, 8000)
    hi = np.isin(ref_data.data["subject"].flatten(), SR_HI_SUBJECTS)
    # identical bytes where no resample happens (f32 storage rounding only);
    # the 48 kHz subjects compare our from-scratch FFT resampler against
    # the real scipy running inside the reference loader (f32 vs f64
    # intermediate precision bounds the gap at ~1e-4 relative)
    assert np.allclose(ra[~hi], oa[~hi], atol=1e-2)
    assert np.allclose(ra[hi], oa[hi], rtol=1e-3, atol=2.0), (
        np.abs(ra[hi] - oa[hi]).max())

    for k in ("country_of_origin", "accent", "gender", "native_speaker"):
        assert ref_data.data[k].flatten().tolist() == ours.raw[k].tolist(), k
    for k in ("digit", "age", "subject", "run"):
        assert np.array_equal(ref_data.data[k].flatten(), ours.raw[k]), k

    ref_batches = list(ref_data.stream(batch_size=512, shuffle=False,
                                       excluded_runs=ref_audio.VALIDATION_RUNS))
    our_batches = list(ours.stream(batch_size=512, shuffle=False,
                                   excluded_runs=VALIDATION_RUNS))
    assert len(ref_batches) == len(our_batches)
    onehots = ("country_of_origin", "native_speaker", "accent", "digit",
               "age", "gender")
    for bi in list(range(3)) + [len(ref_batches) - 1]:
        rb, ob = ref_batches[bi], our_batches[bi]
        for k in onehots:  # sklearn codecs vs ours: exact
            assert np.array_equal(rb[k].numpy(), np.asarray(ob[k])), (bi, k)
        # torch-stft log-spect vs our jax pipeline: tight in the bulk;
        # the max sits on noise-floor bins at the tone/silence boundary
        # where f32 STFT rounding dominates the log (probe: max 0.11)
        r, o = rb["audio"].numpy(), np.asarray(ob["audio"])
        assert r.shape == o.shape == (len(r), 128, 128)
        err = np.abs(r - o)
        assert np.quantile(err, 0.99) < 0.05, (bi, np.quantile(err, 0.99))
        assert err.max() < 0.5, (bi, err.max())


# --------------------------------------------------------------- scoring

AUDIO_STANDIN_MODULE = "_e2e_audio_graph_standin"
AUDIO_STANDIN_SRC = '''
import torch

DIMS = {"accent": 15, "age": 5, "country_of_origin": 13,
        "digit": 10, "gender": 2, "native_speaker": 2}


class UniformAudioGraph:
    """Pickle-compatible stand-in for the pyro AudioMNISTCausalGraph: the
    score scripts only draw attribute tuples / resample the cf attribute,
    and the fixture attributes are independent uniforms."""

    def sample(self, obs_in=None, n=None):
        if obs_in is not None:
            n = len(next(iter(obs_in.values())))
            out = {k: torch.as_tensor(v).clone() for k, v in obs_in.items()}
        else:
            out = {}
        for k, d in DIMS.items():
            if k not in out:
                out[k] = torch.randint(0, d, (n,))
        return out
'''


def _craft_digit_clf(prototypes):
    """Reference ``AudioMNISTClassifier`` architecture
    (classifiers/audio_mnist.py:21-42) with crafted weights: every conv is
    a 1/9-averaging carrier on channel 0 (all-positive activations make
    each LeakyReLU an identity), the first Linear reads one carrier cell,
    and the head's tangent-line logits (w_k = u_k, b_k = -u_k^2/2) make
    argmax the nearest prototype."""
    import torch

    from classifiers.audio_mnist import AudioMNISTClassifier

    clf = AudioMNISTClassifier(10)
    with torch.no_grad():
        for m in clf:
            if isinstance(m, torch.nn.Conv2d):
                m.weight.zero_()
                m.bias.zero_()
                m.weight[0, 0] = 1.0 / 9.0
        lin1, lin2 = clf[-3], clf[-1]
        lin1.weight.zero_()
        lin1.bias.zero_()
        lin1.weight[0, 0] = 1.0
        lin2.weight.zero_()
        lin2.bias.zero_()
        feat = torch.nn.Sequential(*list(clf)[:-1])
        for k, ck in enumerate(prototypes):
            u = feat(torch.full((1, 1, 128, 128), float(ck))).flatten()[0].item()
            lin2.weight[k, 0] = u
            lin2.bias[k] = -0.5 * u * u
    return clf


@pytest.fixture(scope="module")
def audio_pipelines(audio_zip60, ref_audio, tmp_path_factory):
    import subprocess

    import torch

    models = tmp_path_factory.mktemp("audio_e2e_models")
    env = {**os.environ, "IMAGECFGEN_PLATFORM": "cpu",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}

    # width 4 instead of the d=64 constructor default — the one deviation
    # from verbatim (see module docstring); scoring logic is untouched
    ref_audio.Encoder.__init__.__defaults__ = (4,)
    ref_audio.Generator.__init__.__defaults__ = (4,)
    torch.manual_seed(0)
    E, G = ref_audio.Encoder(), ref_audio.Generator()
    with torch.no_grad():
        for p in E.parameters():
            p.zero_()  # codes == 0 -> G output depends on attributes only

    # train G (z=0) to emit the per-digit constant c_k; all-positive
    # prototypes keep the crafted classifier's LeakyReLUs in identity mode
    prototypes = np.linspace(0.05, 0.95, 10)
    opt = torch.optim.Adam(G.parameters(), 3e-3)
    rng = np.random.default_rng(0)
    loss = None
    for step in range(600):
        dig = rng.integers(0, 10, 64)
        attrs = {
            k: torch.eye(v)[torch.from_numpy(rng.integers(0, v, 64))].float()
            for k, v in ref_audio.ATTRIBUTE_DIMS.items()
        }
        attrs["digit"] = torch.eye(10)[torch.from_numpy(dig)].float()
        out = G(torch.zeros(64, 512, 1, 1), attrs)
        target = torch.from_numpy(prototypes[dig]).float().reshape(-1, 1, 1, 1)
        loss = ((out - target.expand_as(out)) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    # mean error far inside the 0.05 half-gap between prototypes
    assert float(loss) < 2e-3, float(loss)

    torch.save({"E_state_dict": E.state_dict(), "G_state_dict": G.state_dict(),
                "D_state_dict": ref_audio.Discriminator(4).state_dict()},
               models / "audio-bigan-ref.tar")
    torch.save({"model": _craft_digit_clf(prototypes)},
               models / "audio-digit-clf-ref.tar")

    standin = models / (AUDIO_STANDIN_MODULE + ".py")
    standin.write_text(AUDIO_STANDIN_SRC)
    sys.path.insert(0, str(models))
    mod = __import__(AUDIO_STANDIN_MODULE)
    torch.save({"graph": mod.UniformAudioGraph()},
               models / "audio-attribute-scm-ref.tar")

    # ---- our side: convert + fit our attribute SCM ----------------------
    ours = models / "ours"
    ours.mkdir()
    for kind, inp, out, extra in (
        ("audio-bigan", "audio-bigan-ref.tar", "ours/audio-mnist-bigan.tar", []),
        ("audio-clf", "audio-digit-clf-ref.tar",
         "ours/audio-mnist-digit-clf.tar", ["--attribute", "digit"]),
    ):
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "convert_reference_checkpoint.py"),
             "--kind", kind, "--input", str(models / inp),
             "--output", str(models / out)] + extra,
            capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_audio_mnist_attribute_scm.py"),
         "--zip-path", audio_zip60, "--steps", "300",
         "--output-path", str(ours)],
        capture_output=True, text=True, timeout=1800, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return {"models": models, "ours": ours, "env": env}


def test_audio_bigan_cf_score_parity(audio_zip60, audio_pipelines):
    import subprocess

    models, ours = audio_pipelines["models"], audio_pipelines["ours"]

    out_ref = _run_reference_script(
        "audiomnist_bigan_score.py",
        ["-m", str(models / "audio-bigan-ref.tar"),
         "-a", str(models / "audio-attribute-scm-ref.tar"),
         "--digit-clf", str(models / "audio-digit-clf-ref.tar"),
         "-d", audio_zip60, "-r", "1"],
        cwd=str(models))
    acc_ref = _parse_acc(out_ref, "Digit accuracy")

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "audiomnist_bigan_score.py"),
         "--zip-path", audio_zip60, "--model-dir", str(ours),
         "--attribute", "digit", "--mc-rounds", "1"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env=audio_pipelines["env"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    acc_ours = _parse_acc(proc.stdout, "digit cf accuracy")

    # a correct pipeline is decisively high on both sides; any one-hot
    # ordering / CF-resampling / split deviation collapses a side
    assert acc_ref > 0.9, out_ref[-2000:]
    assert acc_ours > 0.9, proc.stdout[-2000:]
    assert abs(acc_ref - acc_ours) < 0.05, (acc_ref, acc_ours)
