"""AudioMNIST data pipeline: zip ingest (host) + device-side spectrograms.

One implementation of what the reference copies four times nearly
identically (``image_scms/audio_mnist.py:41-170``,
``deepscm_vae/audio_mnist.py``, ``classifiers/audio_mnist.py``,
``attribute_scms/audio_mnist.py``): read the AudioMNIST zip (60 subjects x
10 digits x 50 runs), resample to 8 kHz, zero-pad to 8000 samples, clean
the metadata (spanien->spain, german/spanish->german, age>100 -> 28),
one-hot the 5 categorical features, uniformly 5-bin the age, and stream
batches with run/subject exclusion.

TPU-first: the log-spectrogram transform is a jitted XLA function
(``spectrogram_batch``) rather than the reference's per-item torchaudio
host loop (SURVEY §3.4). Loader batches execute it on the host CPU
backend (``ops/stft.py::host_prep``) — it is data prep whose output is
immediately fetched to numpy, so keeping it off the accelerator avoids a
device->host round-trip per batch; trainers that want the STFT fused
on-device apply ``spectrogram_batch`` inside their own jitted programs.
A deterministic synthetic generator stands in when the real zip is
absent (this image has no data / egress).
"""
from __future__ import annotations

import io
import json
import zipfile
from functools import partial
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import StftConfig, griffin_lim, host_prep, spectrogram

# train/val split used by the image-SCM training code
# (image_scms/audio_mnist.py:18)
VALIDATION_RUNS: List[int] = [38, 7, 42, 10, 14, 18, 20, 22, 28]
# the attribute-SCM package derives a *different* list from seeded randint
# (attribute_scms/audio_mnist.py:13-14) — reproduced verbatim so both split
# semantics are available; do not merge the two.
ATTRIBUTE_SCM_VALIDATION_RUNS: List[int] = [38, 28, 14, 42, 7, 20, 38, 18, 22, 10]

SAMPLE_RATE = 8000
N_SAMPLES = 8000
AUDIO_STFT = StftConfig(n_fft=255, win_length=128, pad=96)  # -> (128, 128)
GRIFFIN_LIM_STFT = StftConfig(n_fft=255, win_length=128, pad=0)

CATEGORICAL_FEATURES = ("country_of_origin", "accent", "digit", "native_speaker", "gender")


@partial(jax.jit, static_argnames=("cfg",))
def spectrogram_batch(audio: jnp.ndarray, cfg: StftConfig = AUDIO_STFT) -> jnp.ndarray:
    """(B, T) waveforms -> (B, F, frames) log power spectrograms
    (``log(Spectrogram(x) + 1e-6)``, reference ``audio_mnist.py:116``)."""
    return jnp.log(spectrogram(audio, cfg) + 1e-6)


def audio_from_log_spect(log_spec: jnp.ndarray, rng=None, n_iter: int = 32) -> jnp.ndarray:
    """Inverse transform: exp -> Griffin-Lim (reference ``:117``; the
    reference's GriffinLim is built without the explicit pad)."""
    return griffin_lim(jnp.exp(log_spec), GRIFFIN_LIM_STFT, rng=rng, n_iter=n_iter)


def _resample_to_8k(wav: np.ndarray, sr: int) -> np.ndarray:
    """48k->8k exactly as the reference does it: FFT-domain
    ``scipy.signal.resample`` — the reference passes
    ``res_type="scipy"`` to librosa (``image_scms/audio_mnist.py:77-79``),
    NOT the kaiser_best default the round-1/2 reviews assumed.
    ``ops/resample.py`` pins the kernel against the scipy golden and also
    offers kaiser_best for users of librosa's default."""
    if sr == SAMPLE_RATE:
        return wav.astype(np.float32)
    from ..ops.resample import resample

    return resample(wav, sr, SAMPLE_RATE).astype(np.float32)


class OneHotVocab:
    """Sorted-unique vocabulary one-hot codec (sklearn OneHotEncoder
    semantics: categories sorted ascending). ``categories`` may be given
    explicitly to pin the width (the synthetic stand-in pins the real
    dataset's cardinalities so model specs line up)."""

    def __init__(self, values: Sequence, categories: Optional[Sequence] = None):
        self.categories = sorted(set(values)) if categories is None else sorted(categories)
        self.index = {v: i for i, v in enumerate(self.categories)}

    @property
    def n(self) -> int:
        return len(self.categories)

    def encode(self, values) -> np.ndarray:
        out = np.zeros((len(values), self.n), np.float32)
        for i, v in enumerate(values):
            out[i, self.index[v]] = 1.0
        return out

    def decode(self, onehot: np.ndarray) -> list:
        return [self.categories[i] for i in np.asarray(onehot).argmax(axis=1)]


class UniformBinner:
    """KBinsDiscretizer(strategy="uniform", n_bins=5) semantics."""

    def __init__(self, values: np.ndarray, n_bins: int = 5):
        v = np.asarray(values, float)
        self.lo, self.hi = v.min(), v.max()
        self.n_bins = n_bins
        self.edges = np.linspace(self.lo, self.hi, n_bins + 1)

    def encode(self, values) -> np.ndarray:
        v = np.asarray(values, float)
        bins = np.clip(np.digitize(v, self.edges[1:-1]), 0, self.n_bins - 1)
        out = np.zeros((len(v), self.n_bins), np.float32)
        out[np.arange(len(v)), bins] = 1.0
        return out

    def decode(self, onehot: np.ndarray) -> np.ndarray:
        bins = np.asarray(onehot).argmax(axis=1)
        centers = (self.edges[:-1] + self.edges[1:]) / 2.0
        return centers[bins]


class AudioMNISTData:
    """Host-side dataset: raw 8 kHz waveforms + encoded metadata."""

    def __init__(self, path_to_zip: Optional[str] = None, synthetic_runs: int = 4,
                 synthetic_seed: int = 0):
        if path_to_zip is not None:
            self._load_zip(path_to_zip)
        else:
            self._load_synthetic(runs=synthetic_runs, seed=synthetic_seed)
        self._fit_encoders()

    # ------------------------------------------------------------ ingest

    def _load_zip(self, path_to_zip: str) -> None:
        from scipy.io import wavfile

        raw: Dict[str, list] = {
            k: []
            for k in ("audio", "country_of_origin", "native_speaker", "accent",
                      "digit", "age", "gender", "subject", "run")
        }
        with zipfile.ZipFile(path_to_zip, "r") as zf:
            meta = json.loads(zf.read("data/audioMNIST_meta.txt").decode("utf-8"))
            names = set(zf.namelist())
            # subjects/digits/runs come from the archive itself (the real
            # dataset is the full 60 x 10 x 50 grid the reference hard-codes
            # at image_scms/audio_mnist.py:69-76; discovering them makes
            # partial fixtures loadable without changing real-data behavior)
            for name in sorted(meta.keys()):
                subject_num = int(name)
                sm = meta[name]
                country = sm["origin"].split(", ")[1].lower()
                if country == "spanien":
                    country = "spain"
                accent = sm["accent"].lower()
                if accent == "german/spanish":
                    accent = "german"
                age = int(sm["age"])
                if age > 100:  # known metadata error
                    age = 28
                for dig in range(10):
                    for run in range(50):
                        fname = f"data/{name}/{dig}_{name}_{run}.wav"
                        if fname not in names:
                            continue
                        sr, wav = wavfile.read(io.BytesIO(zf.read(fname)))
                        wav = _resample_to_8k(wav, sr)
                        if len(wav) > N_SAMPLES:
                            raise ValueError("data length cannot exceed padding length")
                        buf = np.zeros(N_SAMPLES, np.float32)
                        buf[: len(wav)] = wav
                        raw["audio"].append(buf)
                        raw["country_of_origin"].append(country)
                        raw["native_speaker"].append(sm["native speaker"])
                        raw["accent"].append(accent)
                        raw["digit"].append(dig)
                        raw["age"].append(age)
                        raw["gender"].append(sm["gender"])
                        raw["subject"].append(subject_num)
                        raw["run"].append(run)
        self.raw = {k: np.asarray(v) for k, v in raw.items()}
        self.raw["audio"] = np.stack(raw["audio"], axis=0)

    def _load_synthetic(self, runs: int = 4, seed: int = 0) -> None:
        """Deterministic stand-in: per-digit fundamental + per-subject
        harmonics; metadata with real causal structure (country drives
        native_speaker and accent) so SCM fitting has signal."""
        rng = np.random.default_rng(seed)
        countries = ["germany", "spain", "france", "italy", "china", "brazil",
                     "egypt", "india", "japan", "kenya", "mexico", "norway", "turkey"]
        accents = ["german", "spanish", "french", "italian", "chinese", "portuguese",
                   "arabic", "hindi", "japanese", "swahili", "mexican", "norwegian",
                   "turkish", "english", "other"]
        # pin full vocabularies so one-hot widths match the real dataset's
        # cardinalities (13 countries, 15 accents, ... — scm/audio_mnist.py)
        self._fixed_categories = {
            "country_of_origin": countries,
            "accent": accents,
            "digit": list(range(10)),
            "native_speaker": ["no", "yes"],
            "gender": ["female", "male"],
        }
        raw = {k: [] for k in ("audio", "country_of_origin", "native_speaker",
                               "accent", "digit", "age", "gender", "subject", "run")}
        t = np.arange(N_SAMPLES) / SAMPLE_RATE
        for subject in range(1, 61):
            srng = np.random.default_rng(seed * 1000 + subject)
            country = countries[srng.integers(0, len(countries))]
            is_german = country == "germany"
            native = "yes" if (is_german or srng.uniform() < 0.2) else "no"
            if native == "yes" and is_german:
                accent = "german"
            elif srng.uniform() < 0.7:
                accent = accents[countries.index(country)]
            else:
                accent = "english"
            age = int(srng.integers(20, 61))
            gender = "male" if srng.uniform() < 0.6 else "female"
            # subject identity lives in timbre (harmonic amplitude profile
            # + a small pitch offset), NOT in the class-defining
            # fundamental: an earlier design used
            # f = (90 + 3*subject)*(1 + 0.35*digit), which confounds digit
            # with subject (overlapping frequency ranges across digits) and
            # caps any digit classifier near chance on held-out runs.
            a2 = 0.25 + 0.5 * srng.uniform()
            a3 = 0.10 + 0.35 * srng.uniform()
            pitch_shift = 1.0 + 0.02 * srng.normal()
            for dig in range(10):
                # digit -> fixed fundamental (150..690 Hz, well under the
                # 4 kHz Nyquist) + digit-dependent burst count, mimicking
                # how spoken digits differ in phoneme structure
                f = 150.0 * (1.0 + 0.40 * dig) * pitch_shift
                n_bursts = 1 + dig % 3
                for run in range(runs):
                    rr = np.random.default_rng(seed * 100000 + subject * 100 + dig * 10 + run)
                    dur = int(N_SAMPLES * rr.uniform(0.5, 0.95))
                    env = np.hanning(dur)
                    if n_bursts > 1:
                        env = env * (
                            1.0 - 0.85 * np.sin(np.pi * n_bursts * np.arange(dur) / dur) ** 2
                        )
                    sig = np.zeros(N_SAMPLES, np.float32)
                    tone = (
                        np.sin(2 * np.pi * f * t[:dur])
                        + a2 * np.sin(2 * np.pi * 2 * f * t[:dur])
                        + a3 * np.sin(2 * np.pi * 3 * f * t[:dur])
                    )
                    sig[:dur] = (env * tone + 0.02 * rr.normal(0, 1, dur)).astype(np.float32)
                    raw["audio"].append(sig)
                    raw["country_of_origin"].append(country)
                    raw["native_speaker"].append(native)
                    raw["accent"].append(accent)
                    raw["digit"].append(dig)
                    raw["age"].append(age)
                    raw["gender"].append(gender)
                    raw["subject"].append(subject)
                    raw["run"].append(run)
        self.raw = {k: np.asarray(v) for k, v in raw.items()}
        self.raw["audio"] = np.stack(raw["audio"], axis=0)

    # ------------------------------------------------------------ splits

    @property
    def validation_runs(self) -> List[int]:
        """VALIDATION_RUNS restricted to runs actually present; falls back
        to the last observed run (the synthetic stand-in has few runs)."""
        observed = set(int(r) for r in np.unique(self.raw["run"]))
        present = [r for r in VALIDATION_RUNS if r in observed]
        return present if present else [max(observed)]

    @property
    def training_excluded_runs(self) -> List[int]:
        return self.validation_runs

    @property
    def validation_excluded_runs(self) -> List[int]:
        observed = set(int(r) for r in np.unique(self.raw["run"]))
        return sorted(observed - set(self.validation_runs))

    # ------------------------------------------------------------ encoders

    def _fit_encoders(self) -> None:
        fixed = getattr(self, "_fixed_categories", {})
        self.vocabs: Dict[str, OneHotVocab] = {
            k: OneHotVocab(self.raw[k].tolist(), categories=fixed.get(k))
            for k in CATEGORICAL_FEATURES
        }
        self.age_binner = UniformBinner(self.raw["age"], n_bins=5)

    def encode_attrs(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        out = {
            k: self.vocabs[k].encode(self.raw[k][idx].tolist())
            for k in CATEGORICAL_FEATURES
        }
        out["age"] = self.age_binner.encode(self.raw["age"][idx])
        return out

    @property
    def attribute_dims(self) -> Dict[str, int]:
        dims = {k: v.n for k, v in self.vocabs.items()}
        dims["age"] = self.age_binner.n_bins
        return dims

    # ------------------------------------------------------------ streaming

    def split_indices(
        self,
        excluded_runs: Optional[Sequence[int]] = None,
        excluded_subjects: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        mask = ~np.isin(self.raw["run"], np.asarray(excluded_runs or []))
        mask &= ~np.isin(self.raw["subject"], np.asarray(excluded_subjects or []))
        return np.nonzero(mask)[0]

    def stream(
        self,
        batch_size: int = 128,
        shuffle: bool = True,
        excluded_runs: Optional[Sequence[int]] = None,
        excluded_subjects: Optional[Sequence[int]] = None,
        seed: int = 0,
        transform: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields dict batches; ``audio`` is the log-spectrogram (device
        array) when ``transform`` else the raw waveform."""
        idx = self.split_indices(excluded_runs, excluded_subjects)
        if shuffle:
            idx = np.random.default_rng(seed).permutation(idx)
        for i in range(0, len(idx), batch_size):
            sel = idx[i : i + batch_size]
            batch: Dict[str, np.ndarray] = {"subject": self.raw["subject"][sel],
                                            "run": self.raw["run"][sel]}
            batch.update(self.encode_attrs(sel))
            audio = self.raw["audio"][sel]
            batch["audio"] = (
                host_prep(spectrogram_batch, audio) if transform else audio
            )
            yield batch

    def all_spectrograms(
        self,
        excluded_runs: Optional[Sequence[int]] = None,
        excluded_subjects: Optional[Sequence[int]] = None,
        batch_size: int = 512,
    ):
        """(spectrograms (N,F,T) float32, attrs dict, indices) for
        device-resident training."""
        idx = self.split_indices(excluded_runs, excluded_subjects)
        outs = []
        for i in range(0, len(idx), batch_size):
            sel = idx[i : i + batch_size]
            outs.append(host_prep(spectrogram_batch, self.raw["audio"][sel]))
        return np.concatenate(outs, axis=0), self.encode_attrs(idx), idx
