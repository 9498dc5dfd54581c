"""Whale-call loader head-to-head against the reference (round-3 follow-on
to the audio leg of VERDICT r2 item 2).

The reference ``WhaleCallData`` (``image_scms/whalecalls.py:38-227``) runs
verbatim on a constructed XBAT-style directory tree (torchaudio replaced
by the functional torch.stft stand-in pinned by tests/test_stft.py) and
is compared against ours: exact train/validation split membership (same
legacy-NumPy seed consumption — leakage-free scoring of converted
reference checkpoints depends on this), clip extraction, SNR filtering,
call-type one-hots, event-window times, and the log-spectrogram
transform.
"""
import os

import numpy as np
import pytest

from test_e2e_audio_parity import _install_functional_stubs
from test_e2e_parity import REFERENCE
from test_real_data_fixtures import _write_call_log, _write_wav

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference sources unavailable"),
]

SR = 2000


@pytest.fixture(scope="module")
def whale_tree(tmp_path_factory):
    """5 recordings per class across 2 dates (0.2 split -> 4 train / 1
    validation each), with per-date XBAT logs whose events fall inside
    specific 15-minute recording windows."""
    tmp = tmp_path_factory.mktemp("whale_h2h")
    rng = np.random.default_rng(7)
    dirs = {k: tmp / k for k in ("nocall", "shotgun", "upcall")}

    starts = ["001500", "003000", "004500"]  # within date 1
    starts2 = ["001500", "010000"]           # within date 2
    dates = [("20090328", starts), ("20090402", starts2)]
    for kind in dirs:
        for date, hhmms in dates:
            for hhmm in hhmms:
                rec = rng.normal(0, 300, 120 * SR)
                _write_wav(str(dirs[kind] / f"site_{date}" /
                               f"rec_{date}_{hhmm}.wav"), SR, rec)
    # events: absolute seconds; each recording covers [start, start+900)
    # but only its first 120 s exist on disk
    for kind, widths in (("shotgun", 0.5), ("upcall", 1.2)):
        for date, hhmms in dates:
            events, tags = [], []
            for hhmm in hhmms:
                lower = 3600 * int(hhmm[:2]) + 60 * int(hhmm[2:4])
                events += [(lower + 5.0, lower + 5.0 + widths),
                           (lower + 60.0, lower + 60.0 + widths)]
                tags += ["", ""]
            # one tagged (parse-filtered) and one out-of-any-window event
            events += [(lower + 30.0, lower + 31.0), (90000.0, 90001.0)]
            tags += ["boat", ""]
            _write_call_log(str(dirs[kind] / f"calls_{date}_log.mat"),
                            events, tags)
    return {k: str(v) for k, v in dirs.items()}


@pytest.fixture(scope="module")
def ref_whale():
    from tools.convert_reference_checkpoint import _install_reference_shims

    _install_functional_stubs()
    _install_reference_shims(REFERENCE)
    import image_scms.whalecalls as ref_wc  # noqa: E402

    return ref_wc


def test_whale_loader_head_to_head(whale_tree, ref_whale):
    from imagecfgen_tpu.data.whalecalls import WhaleCallData

    ref_data = ref_whale.WhaleCallData(
        nocall_directory=whale_tree["nocall"],
        shotgun_directory=whale_tree["shotgun"],
        upcall_directory=whale_tree["upcall"],
        validation_split=0.2, seed=42)
    ours = WhaleCallData(
        nocall_directory=whale_tree["nocall"],
        shotgun_directory=whale_tree["shotgun"],
        upcall_directory=whale_tree["upcall"],
        validation_split=0.2, seed=42)

    # --- exact split membership (identical seed-42 RNG consumption)
    assert ref_data.shotgun_train_paths == ours.paths["shotgun"]["train"]
    assert ref_data.shotgun_validation_paths == ours.paths["shotgun"]["validation"]
    assert ref_data.upcall_train_paths == ours.paths["upcall"]["train"]
    assert ref_data.upcall_validation_paths == ours.paths["upcall"]["validation"]
    assert ref_data.nocall_train_paths == ours.paths["nocall"]["train"]
    assert ref_data.nocall_validation_paths == ours.paths["nocall"]["validation"]

    for mode in ("train", "validation"):
        # one giant batch: the reference flushes on wav boundaries, we
        # flush on exact batch_size, so boundaries only match when
        # everything fits in a single batch
        rb = next(ref_data.stream(transform=False, batch_size=10 ** 6,
                                  shuffle=False, mode=mode))
        ob = next(ours.stream(transform=False, batch_size=10 ** 6,
                              shuffle=False, mode=mode))
        ra, oa = rb["audio"].numpy(), ob["audio"]
        assert ra.shape == oa.shape, (mode, ra.shape, oa.shape)
        assert np.allclose(ra, oa, atol=1e-3), (mode, np.abs(ra - oa).max())
        assert np.array_equal(rb["call_type"].numpy(), ob["call_type"]), mode
        assert np.allclose(np.asarray(rb["time"], np.float64),
                           np.asarray(ob["time"], np.float64)), mode
        assert [str(p) for p in rb["path"]] == [str(p) for p in ob["path"]], mode

    # --- log-spectrogram transform (torch.stft vs our jax stft)
    rb = next(ref_data.stream(transform=True, batch_size=10 ** 6,
                              shuffle=False, mode="validation"))
    ob = next(ours.stream(transform=True, batch_size=10 ** 6,
                          shuffle=False, mode="validation"))
    r, o = rb["audio"].numpy(), np.asarray(ob["audio"])
    assert r.shape == o.shape
    err = np.abs(r - o)
    assert np.quantile(err, 0.99) < 0.05, np.quantile(err, 0.99)
    assert err.max() < 0.5, err.max()
