"""UVR5 spec utilities + distributed helpers."""

import numpy as np

from lemas_tts_tpu.uvr5.spec_utils import (
    AVERAGE,
    MAX_SPEC,
    MIN_SPEC,
    adjust_aggr,
    combine_spectrograms,
    ensembling,
    mirroring,
    spectrogram_to_wave,
    wave_to_spectrogram,
)


def _stereo(seed=0, n=4096):
    rng = np.random.default_rng(seed)
    return (0.3 * rng.standard_normal((2, n))).astype(np.float32)


def test_wave_spectrogram_roundtrip():
    x = _stereo()
    # b2 round-trips at 0.5 gain by design (reference :279 decode formula)
    for ms, ms2, rev, gain in ((False, False, False, 1.0),
                               (True, False, False, 1.0),
                               (False, True, False, 0.5),
                               (False, False, True, 1.0)):
        spec = wave_to_spectrogram(x, 256, 1024, ms, ms2, rev)
        assert spec.shape[0] == 2 and spec.shape[1] == 513
        y = spectrogram_to_wave(spec, 256, ms, ms2, rev)
        n = min(x.shape[1], y.shape[1])
        np.testing.assert_allclose(y[:, 256:n-256], gain * x[:, 256:n-256],
                                   atol=2e-3)


def test_ensembling_modes():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((2, 8, 10)) + 1j * rng.standard_normal((2, 8, 10))
    b = rng.standard_normal((2, 8, 12)) + 1j * rng.standard_normal((2, 8, 12))
    mn = ensembling(MIN_SPEC, [a, b])
    mx = ensembling(MAX_SPEC, [a, b])
    assert mn.shape == (2, 8, 10)
    assert (np.abs(mn) <= np.abs(mx) + 1e-9).all()
    av = ensembling(AVERAGE, [a, b[:, :, :10]])
    np.testing.assert_allclose(av, (a + b[:, :, :10]) / 2)


def test_adjust_aggr_powers():
    mask = np.full((2, 10, 4), 0.5)
    out = adjust_aggr(mask, False, {"value": 0.3, "split_bin": 5,
                                    "aggr_correction": None})
    np.testing.assert_allclose(out[0, :5], 0.5 ** 1.1)
    np.testing.assert_allclose(out[0, 5:], 0.5 ** 1.3)
    # zero aggressiveness is identity
    np.testing.assert_array_equal(
        adjust_aggr(mask, False, {"value": 0, "split_bin": 5}), mask
    )


def test_mirroring_bounded():
    rng = np.random.default_rng(2)
    spec = rng.standard_normal((2, 64, 6)) + 1j * rng.standard_normal((2, 64, 6))
    hi = rng.standard_normal((2, 10, 6)) + 1j * rng.standard_normal((2, 10, 6))
    out = mirroring("mirroring", spec, hi, pre_filter_start=40)
    assert out.shape == hi.shape
    assert (np.abs(out) <= np.abs(hi) + 1e-9).all()  # never amplifies


def test_combine_spectrograms():
    rng = np.random.default_rng(3)
    s1 = rng.standard_normal((2, 32, 5)).astype(np.complex64)
    s2 = rng.standard_normal((2, 32, 5)).astype(np.complex64)
    bands = [{"crop_start": 0, "crop_stop": 16},
             {"crop_start": 4, "crop_stop": 20}]
    out = combine_spectrograms({1: s1, 2: s2}, bands, total_bins=32)
    assert out.shape == (2, 33, 5)
    np.testing.assert_array_equal(out[:, :16], s1[:, 0:16])
    np.testing.assert_array_equal(out[:, 16:32], s2[:, 4:20])


def test_distributed_single_process_noop():
    from lemas_tts_tpu.parallel.distributed import (
        initialize,
        is_primary,
        make_global_mesh,
    )

    assert initialize() is False  # no coordinator env → single-process no-op
    assert is_primary()
    mesh = make_global_mesh(model_parallel=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 == len(mesh.devices.flatten())


def test_pyrb_and_augment_audio_gated(tmp_path):
    """rubberband wrapper (reference pyrb.py): identity fast-paths work
    without the binary; the shell-out path either runs (binary present) or
    raises the reference's RuntimeError message."""
    import shutil

    import numpy as np

    from lemas_tts_tpu.uvr5 import pyrb
    from lemas_tts_tpu.uvr5.spec_utils import augment_audio, normalize, to_shape
    from lemas_tts_tpu.utils.audio_io import read_audio, write_wav

    y = np.random.default_rng(0).uniform(-0.5, 0.5, 400).astype(np.float32)
    assert pyrb.time_stretch(y, 8000, 1.0) is y  # rate 1.0 = no-op
    assert pyrb.pitch_shift(y, 8000, 0) is y
    import pytest

    with pytest.raises(ValueError):
        pyrb.time_stretch(y, 8000, 0.0)

    assert to_shape(np.ones((2, 3)), (2, 5)).shape == (2, 5)
    big = np.array([2.0, -4.0])
    np.testing.assert_allclose(normalize(big, True), [0.5, -1.0])
    assert normalize(big, False) is big

    src = tmp_path / "in.wav"
    write_wav(str(src), y, 8000)
    if shutil.which("rubberband"):
        out = augment_audio(str(tmp_path / "out.wav"), str(src), 1.5)
        wav, sr = read_audio(out)
        assert sr == 8000 and wav.shape[-1] > 0
    else:
        with pytest.raises(RuntimeError, match="rubberband"):
            augment_audio(str(tmp_path / "out.wav"), str(src), 1.5)


def test_merge_artifacts_reference_fades():
    import numpy as np
    import pytest

    from lemas_tts_tpu.uvr5.spec_utils import merge_artifacts

    with pytest.raises(ValueError, match="fade_size"):
        merge_artifacts(np.zeros((2, 3, 100)), min_range=10, fade_size=32)

    # one long active range [20, 90): fades at its edges, plateau inside
    mask = np.zeros((1, 1, 128), np.float32)
    mask[:, :, 20:90] = 0.5
    out = merge_artifacts(mask, thres=0.01, min_range=16, fade_size=4)
    assert out.shape == mask.shape
    assert np.isclose(out[0, 0, 40], 1.0)          # plateau pushed to 1
    assert 0.5 <= out[0, 0, 21] < 1.0              # rising fade
    assert np.isclose(out[0, 0, 10], 0.0)          # untouched outside
    # short active ranges are left alone
    short = np.zeros((1, 1, 64), np.float32)
    short[:, :, 5:10] = 0.5
    np.testing.assert_array_equal(
        merge_artifacts(short, min_range=16, fade_size=4), short)


def test_combine_spectrograms_unequal_frames():
    import numpy as np

    from lemas_tts_tpu.uvr5.spec_utils import combine_spectrograms

    specs = {1: np.ones((2, 12, 10), np.complex64),
             2: np.ones((2, 12, 9), np.complex64)}
    bands = [dict(crop_start=0, crop_stop=6), dict(crop_start=2, crop_stop=8)]
    out = combine_spectrograms(specs, bands, total_bins=12)
    assert out.shape == (2, 13, 9)  # trimmed to the shortest band
