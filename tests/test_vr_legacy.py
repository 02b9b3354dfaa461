"""Legacy VR-arch (CascadedASPPNet) tests: torch-mirror conversion parity,
band-parameter registry, multi-band spectrogram chain, and the end-to-end
multi-band separation loop (reference ``uvr5/lib_v5/vr_network/nets.py`` +
``model_param_init.py`` + ``spec_utils.py:154-178,307-378``)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lemas_tts_tpu.uvr5.band_params import (
    list_band_params,
    load_band_params,
)
from lemas_tts_tpu.uvr5.spec_utils import (
    cmb_spectrogram_to_wave,
    combine_spectrograms_mp,
    fft_hp_filter,
    fft_lp_filter,
    make_padding,
    wave_to_spectrogram,
)
from lemas_tts_tpu.uvr5.vr_legacy import (
    CascadedASPPNet,
    convert_cascaded_aspp,
    infer_architecture,
    is_legacy_state_dict,
)
from tests.torch_ref.vr_legacy_torch import CascadedASPPNetTorch


def _random_torch_sd(arch: int, n_fft: int = 64, seed: int = 1):
    torch.manual_seed(0)
    t = CascadedASPPNetTorch(n_fft, arch).eval()
    sd = t.state_dict()
    g = torch.Generator().manual_seed(seed)
    sd = {k: (torch.randn(v.shape, generator=g) * 0.1
              if v.dtype == torch.float32 else v) for k, v in sd.items()}
    for k in sd:
        if "running_var" in k:
            sd[k] = sd[k].abs() + 0.5
    t.load_state_dict(sd)
    np_sd = {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
    return t, np_sd


@pytest.mark.parametrize("arch", [31191, pytest.param(33966, marks=pytest.mark.slow),
                                  pytest.param(129605, marks=pytest.mark.slow)])
def test_legacy_parity(arch):
    """Converted legacy checkpoints match the torch mirror bit-closely,
    across the 5-branch, shared-weight 7-branch, and 5-stage variants."""
    n_fft = 64
    t, np_sd = _random_torch_sd(arch, n_fft)
    assert is_legacy_state_dict(np_sd)
    assert infer_architecture(np_sd) == arch
    variables, arch2 = convert_cascaded_aspp(np_sd)
    m = CascadedASPPNet(n_fft=n_fft, nn_architecture=arch2)
    x = np.random.default_rng(2).standard_normal((1, 2, 33, 32)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    assert got.shape == ref.shape == (1, 2, n_fft // 2 + 1, 32)
    # sigmoid outputs are O(1); wider archs (7-branch ASPP) accumulate a bit
    # more conv/BN float drift → atol 1e-4 ≈ the repo's rtol~2e-4 convention
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert got.min() >= 0 and got.max() <= 1  # sigmoid mask


def test_band_param_registry_invariants():
    """All 23 vendored configs load with int band keys and internally
    consistent bin counts (sum of band crops == total bins — the contract
    ``combine_spectrograms`` relies on)."""
    names = list_band_params()
    assert len(names) == 24  # 23 model configs + ensemble
    for name in names:
        mp = load_band_params(name)
        bands = mp["band"]
        assert all(isinstance(k, int) for k in bands)
        crops = sum(b["crop_stop"] - b["crop_start"] for b in bands.values())
        # "cut"/lofi configs leave top bins empty; none may overflow
        assert crops <= mp["bins"], name
        assert mp["band"][len(bands)]["sr"] == mp["sr"], name
        for flag in ("mid_side", "mid_side_b2", "reverse"):
            assert flag in mp
    with pytest.raises(FileNotFoundError):
        load_band_params("no_such_config")


def test_band_params_default():
    mp = load_band_params(None)
    assert len(mp["band"]) == 2 and mp["sr"] == 44100


def test_fft_filters_match_reference_loops():
    """Vectorized lp/hp ramps equal the reference's per-bin loops
    (``spec_utils.py:347-365``)."""
    rng = np.random.default_rng(0)
    spec = (rng.standard_normal((2, 64, 8)) +
            1j * rng.standard_normal((2, 64, 8))).astype(np.complex64)

    def ref_lp(s, b0, b1):
        s = np.array(s, copy=True)
        g = 1.0
        for b in range(b0, b1):
            g -= 1 / (b1 - b0)
            s[:, b, :] = g * s[:, b, :]
        s[:, b1:, :] *= 0
        return s

    def ref_hp(s, b0, b1):
        s = np.array(s, copy=True)
        g = 1.0
        for b in range(b0, b1, -1):
            g -= 1 / (b0 - b1)
            s[:, b, :] = g * s[:, b, :]
        s[:, 0:b1 + 1, :] *= 0
        return s

    # the reference's running `g -= 1/n` accumulates rounding, leaving its
    # final bin at ~1e-16 instead of exactly 0 → compare with atol
    np.testing.assert_allclose(fft_lp_filter(spec, 20, 40),
                               ref_lp(spec, 20, 40), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fft_hp_filter(spec, 40, 20),
                               ref_hp(spec, 40, 20), rtol=1e-5, atol=1e-6)


def test_make_padding():
    left, right, roi = make_padding(100, 512, 128)
    assert (left, roi) == (128, 256)
    assert (100 % roi) + right - left == roi  # pad completes the last window


TINY_MP = {
    "bins": 88, "unstable_bins": 0, "reduction_bins": 0, "sr": 8000,
    "pre_filter_start": 85, "pre_filter_stop": 88,
    "mid_side": False, "mid_side_b": False, "mid_side_b2": False,
    "stereo_w": False, "stereo_n": False, "reverse": False,
    "band": {
        1: {"sr": 1000, "hl": 16, "n_fft": 64, "crop_start": 0,
            "crop_stop": 16, "lpf_start": 8, "lpf_stop": 12,
            "res_type": "polyphase"},
        2: {"sr": 2000, "hl": 32, "n_fft": 64, "crop_start": 4,
            "crop_stop": 24, "hpf_start": 8, "hpf_stop": 4,
            "lpf_start": 16, "lpf_stop": 24, "res_type": "polyphase"},
        3: {"sr": 4000, "hl": 64, "n_fft": 96, "crop_start": 10,
            "crop_stop": 30, "hpf_start": 12, "hpf_stop": 6,
            "lpf_start": 24, "lpf_stop": 32, "res_type": "polyphase"},
        4: {"sr": 8000, "hl": 128, "n_fft": 128, "crop_start": 16,
            "crop_stop": 48, "hpf_start": 24, "hpf_stop": 12,
            "res_type": "kaiser_fast"},
    },
}


def test_combine_and_cmb_roundtrip_shapes():
    """4-band analysis/synthesis chain: combine → cmb returns audio at the
    top-band rate with energy in every crossover region."""
    rng = np.random.default_rng(3)
    sr = 8000
    x = rng.standard_normal((2, sr)).astype(np.float32) * 0.1

    from lemas_tts_tpu.ops.resample import resample

    specs, waves = {}, {}
    band_ids = sorted(TINY_MP["band"])
    for d in reversed(band_ids):
        bp = TINY_MP["band"][d]
        if d == band_ids[-1]:
            waves[d] = x
        else:
            waves[d] = np.asarray(resample(
                jnp.asarray(waves[d + 1]), TINY_MP["band"][d + 1]["sr"],
                bp["sr"]))
        specs[d] = wave_to_spectrogram(waves[d], bp["hl"], bp["n_fft"])
    spec_m = combine_spectrograms_mp(specs, TINY_MP)
    assert spec_m.shape[0] == 2 and spec_m.shape[1] == TINY_MP["bins"] + 1
    out = cmb_spectrogram_to_wave(spec_m, TINY_MP)
    assert out.shape[0] == 2
    # identity mask (y = X) reconstructs roughly the right duration
    assert abs(out.shape[1] - sr) < sr * 0.2
    assert np.isfinite(out).all() and np.abs(out).max() > 0


@pytest.mark.slow
def test_multiband_separator_end_to_end():
    """Full multi-band VRSeparator loop on a tiny 4-band config with a
    random-weight new-arch net: finite stems at the config rate, and
    primary + secondary equals the combined-spec mixture by construction."""
    import warnings

    from lemas_tts_tpu.uvr5.vr_network import VRSeparator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sep = VRSeparator(n_fft=2 * TINY_MP["bins"], hop=64, nout=4,
                          nout_lstm=8, offset=4, window_size=32,
                          band_params=TINY_MP)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 8000)) * 0.1).astype(np.float32)
    primary, secondary, out_sr = sep.separate_full(x, 8000)
    assert out_sr == TINY_MP["sr"]
    assert primary.shape[0] == 2 and secondary.shape[0] == 2
    assert np.isfinite(primary).all() and np.isfinite(secondary).all()
    # masks are strictly inside (0,1) → both stems carry signal
    assert np.abs(primary).max() > 0 and np.abs(secondary).max() > 0


@pytest.mark.slow
def test_legacy_from_file_multiband(tmp_path):
    """A saved legacy torch checkpoint loads through from_file (arch +
    band-param wiring) and separates end-to-end in multi-band mode."""
    from lemas_tts_tpu.uvr5.vr_network import VRSeparator

    _, np_sd = _random_torch_sd(31191, n_fft=2 * TINY_MP["bins"])
    torch.save({k: torch.from_numpy(v) for k, v in np_sd.items()},
               tmp_path / "legacy_vr.pth")
    sep = VRSeparator.from_file(str(tmp_path / "legacy_vr.pth"),
                                band_params=TINY_MP, window_size=288)
    assert isinstance(sep.model, CascadedASPPNet)
    assert sep.offset == 128 and sep.n_fft == 2 * TINY_MP["bins"]
    x = (np.random.default_rng(1).standard_normal((2, 4000)) * 0.1
         ).astype(np.float32)
    primary, secondary, out_sr = sep.separate_full(x, 8000)
    assert out_sr == TINY_MP["sr"]
    assert np.isfinite(primary).all()
