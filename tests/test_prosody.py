"""Prosody encoder (ECAPA-TDNN) + kaldi fbank tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.models.prosody import (
    ECAPA_TDNN,
    ECAPAConfig,
    ProsodyEncoder,
    convert_prosody_encoder,
    remap_prosody_state_dict,
)
from lemas_tts_tpu.ops.fbank import extract_fbank_16k, kaldi_fbank, kaldi_mel_banks

TINY = ECAPAConfig(
    channels=(32, 32, 32, 96),
    kernel_sizes=(5, 3, 3, 1),
    dilations=(1, 2, 3, 1),
    attention_channels=16,
    res2net_scale=4,
    se_channels=16,
    global_context=True,
    groups=(1, 1, 1, 1),
    embed_dim=24,
    input_dim=20,
)


# ------------------------------------------------------------------- fbank
def test_fbank_shape_and_floor():
    sr = 16000
    wav = np.zeros(sr, dtype=np.float32)
    fb = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    # snip_edges frame count: 1 + (16000-400)//160 = 98
    assert fb.shape == (98, 80)
    # silence hits the log floor everywhere
    assert np.allclose(fb, np.log(np.finfo(np.float32).eps))


def test_fbank_tone_peak_bin():
    sr = 16000
    t = np.arange(sr) / sr
    for hz in (300.0, 1000.0, 3000.0):
        wav = (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)
        fb = np.asarray(kaldi_fbank(jnp.asarray(wav)))
        peak_bin = int(fb.mean(axis=0).argmax())
        # expected mel bin for hz (kaldi mel scale, 20 Hz..8 kHz, 80 bins)
        mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
        frac = (mel(hz) - mel(20.0)) / (mel(8000.0) - mel(20.0))
        expected = int(round(frac * 81)) - 1
        assert abs(peak_bin - expected) <= 1, (hz, peak_bin, expected)


def test_fbank_batched_matches_single():
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((3, 8000)).astype(np.float32) * 0.1
    batched = np.asarray(kaldi_fbank(jnp.asarray(wavs)))
    for i in range(3):
        single = np.asarray(kaldi_fbank(jnp.asarray(wavs[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-6)


def test_extract_fbank_min_length_repeat():
    short = np.ones(100, dtype=np.float32) * 0.1
    fb = extract_fbank_16k(short)
    assert fb.ndim == 2 and fb.shape[1] == 80 and fb.shape[0] >= 1


def test_mel_banks_partition():
    banks = kaldi_mel_banks(80, 512, 16000)
    assert banks.shape == (80, 256)
    assert (banks >= 0).all() and banks.max() <= 1.0 + 1e-6
    # every filter has support
    assert (banks.sum(axis=1) > 0).all()


# ------------------------------------------------------------------- model
def test_ecapa_forward_shape_and_norm():
    model = ECAPA_TDNN(cfg=TINY)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 50, 20)),
                    jnp.float32)
    params = model.init(jax.random.key(0), x)
    emb = model.apply(params, x)
    assert emb.shape == (2, 24)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               rtol=1e-5)


def test_ecapa_frame_mask_ignores_padding():
    model = ECAPA_TDNN(cfg=TINY)
    rng = np.random.default_rng(2)
    x40 = rng.standard_normal((1, 40, 20)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x40))
    e_short = model.apply(params, jnp.asarray(x40))
    # pad to 64 frames with garbage + mask → conv receptive field still leaks
    # a little at the boundary, so compare against an all-ones-mask run instead
    x64 = np.concatenate([x40, 10 + rng.standard_normal((1, 24, 20)).astype(np.float32)], axis=1)
    mask = np.zeros((1, 64), dtype=bool); mask[:, :40] = True
    e_masked = model.apply(params, jnp.asarray(x64), jnp.asarray(mask))
    e_unmasked = model.apply(params, jnp.asarray(x64))
    # masked run is much closer to the short run than the unmasked one
    d_masked = float(np.abs(np.asarray(e_masked) - np.asarray(e_short)).mean())
    d_unmasked = float(np.abs(np.asarray(e_unmasked) - np.asarray(e_short)).mean())
    assert d_masked < d_unmasked


def test_conversion_parity_vs_torch():
    torch = pytest.importorskip("torch")
    from tests.torch_ref.ecapa_torch import EcapaTorch

    tm = EcapaTorch(list(TINY.channels), list(TINY.kernel_sizes),
                    list(TINY.dilations), TINY.attention_channels,
                    TINY.res2net_scale, TINY.se_channels, TINY.embed_dim,
                    TINY.input_dim)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    params = {"params": convert_prosody_encoder(sd, TINY)}
    model = ECAPA_TDNN(cfg=TINY)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 37, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_remap_prefixes():
    sd = {"prosody_encoder.blocks.0.conv.weight": 1,
          "other.key": 2}
    out = remap_prosody_state_dict(sd)
    assert "blocks.0.conv.weight" in out
    assert "other.key" not in out  # non-prefixed keys dropped when remapping


def test_prosody_encoder_embed_end_to_end():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        enc = ProsodyEncoder.build("", "")  # default flagship cfg, random init
    wav = (0.1 * np.random.default_rng(4).standard_normal(16000)).astype(np.float32)
    emb = enc.embed(wav)
    assert emb.shape == (512,)
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-4
