import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.data.audio_mnist import (
    ATTRIBUTE_SCM_VALIDATION_RUNS,
    VALIDATION_RUNS,
    AudioMNISTData,
    UniformBinner,
    audio_from_log_spect,
    spectrogram_batch,
)
from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config
from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES, AudioMNISTAttributeSCM


@pytest.fixture(scope="module")
def audio_data():
    return AudioMNISTData(path_to_zip=None, synthetic_runs=2, synthetic_seed=0)


def test_synthetic_dataset_structure(audio_data):
    d = audio_data
    assert d.raw["audio"].shape == (60 * 10 * 2, 8000)
    dims = d.attribute_dims
    assert dims["digit"] == 10 and dims["gender"] == 2 and dims["age"] == 5
    # split exclusion works
    idx = d.split_indices(excluded_runs=[0])
    assert (d.raw["run"][idx] != 0).all()
    assert len(VALIDATION_RUNS) == 9 and len(ATTRIBUTE_SCM_VALIDATION_RUNS) == 10


def test_stream_transforms_to_spectrograms(audio_data):
    batch = next(audio_data.stream(batch_size=16, seed=0))
    assert batch["audio"].shape == (16, 128, 128)
    assert np.isfinite(batch["audio"]).all()
    for k, n in (("digit", 10), ("gender", 2)):
        assert batch[k].shape == (16, n)
        assert np.allclose(batch[k].sum(axis=1), 1.0)


def test_griffin_lim_roundtrip_on_synthetic_tone(audio_data):
    wav = jnp.asarray(audio_data.raw["audio"][:1])
    ls = spectrogram_batch(wav)
    rec = audio_from_log_spect(ls, rng=jax.random.PRNGKey(0), n_iter=8)
    assert rec.ndim == 2 and rec.shape[0] == 1
    assert np.isfinite(np.asarray(rec)).all()


def test_uniform_binner_matches_kbins_semantics():
    vals = np.array([20, 25, 30, 40, 60])
    b = UniformBinner(vals, n_bins=5)
    enc = b.encode(vals)
    assert enc.shape == (5, 5)
    assert enc[0, 0] == 1.0 and enc[-1, -1] == 1.0
    dec = b.decode(enc)
    assert (np.abs(dec - vals) <= (60 - 20) / 5).all()


def test_audio_bigan_shapes_small():
    """Full audio topology at d=8 (cheap): 128^2 image, dense-stem G."""
    cfg = audio_mnist_bigan_config(d=8, latent_dim=32)
    model = BiGAN(cfg)
    b = 2
    x = jnp.zeros((b, 128, 128, 1))
    z = jnp.zeros((b, 1, 1, 32))
    rng = np.random.default_rng(0)
    attrs = {
        k: jnp.asarray(np.eye(n, dtype=np.float32)[rng.integers(0, n, b)])
        for k, n in CARDINALITIES.items()
    }
    key = jax.random.PRNGKey(0)
    vE = model.encoder.init({"params": key}, x, attrs)
    ex = model.encoder.apply(vE, x, attrs)
    assert ex.shape == (b, 1, 1, 32)
    vG = model.generator.init({"params": key}, z, attrs)
    gz = model.generator.apply(vG, z, attrs)
    assert gz.shape == (b, 128, 128, 1)
    vD = model.discriminator.init({"params": key}, x, z, attrs, train=False)
    d = model.discriminator.apply(vD, x, z, attrs, train=False)
    assert d.shape == (b, 1)


@pytest.mark.slow
def test_audio_attribute_scm_fit_and_cf(audio_data):
    attrs = audio_data.encode_attrs(np.arange(len(audio_data.raw["run"])))
    scm = AudioMNISTAttributeSCM.fit(attrs, steps=60, batch_size=600)

    # conditional MLE learned something: accent given (country, native)
    # should beat the uniform baseline
    obs = {
        "country_of_origin": jnp.asarray(attrs["country_of_origin"].argmax(1)),
        "native_speaker": jnp.asarray(attrs["native_speaker"].argmax(1)),
        "accent": jnp.asarray(attrs["accent"].argmax(1)),
    }
    lp = scm.log_prob(obs)
    assert float(lp["accent"].mean()) > -np.log(15)

    # Gumbel CF consistency: null intervention reproduces all categoricals
    cf = scm.sample_cf(jax.random.PRNGKey(0), obs, {})
    for k in obs:
        assert np.array_equal(np.asarray(cf[k]), np.asarray(obs[k])), k

    # do(country): downstream native_speaker/accent regenerate, digit root
    # is preserved under its identity-noise
    full_obs = dict(obs)
    full_obs["digit"] = jnp.asarray(attrs["digit"].argmax(1))
    new_country = (np.asarray(obs["country_of_origin"]) + 1) % 13
    cf2 = scm.sample_cf(
        jax.random.PRNGKey(1), full_obs, {"country_of_origin": jnp.asarray(new_country)}
    )
    assert np.array_equal(np.asarray(cf2["digit"]), np.asarray(full_obs["digit"]))
    assert np.array_equal(np.asarray(cf2["country_of_origin"]), new_country)
