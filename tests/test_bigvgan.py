"""BigVGAN vocoder tests: alias-free resampling, snake activation, generator
shape/finiteness, weight-norm-folding converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.models.bigvgan import (
    BigVGAN,
    BigVGANConfig,
    SnakeActivation1d,
    convert_bigvgan,
    downsample2x,
    kaiser_sinc_filter1d,
    upsample2x,
)

TINY = BigVGANConfig(
    num_mels=20,
    upsample_initial_channel=32,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
)


def test_kaiser_filter_is_lowpass():
    taps = kaiser_sinc_filter1d(0.25, 0.3, 12)
    assert taps.shape == (12,)
    np.testing.assert_allclose(taps.sum(), 1.0, rtol=1e-6)  # DC gain 1
    # symmetric (even length, half-sample centered)
    np.testing.assert_allclose(taps, taps[::-1], rtol=1e-6)


def test_alias_free_updown_identity():
    """down2x(up2x(x)) ≈ x for band-limited input (the anti-aliasing core)."""
    sr = 1000
    t = np.arange(2048) / sr
    x = (np.sin(2 * np.pi * 40 * t) + 0.3 * np.sin(2 * np.pi * 90 * t))
    x = x.astype(np.float32)[None, :, None]
    y = np.asarray(downsample2x(upsample2x(jnp.asarray(x))))
    assert y.shape == x.shape
    err = np.abs(y[0, 64:-64, 0] - x[0, 64:-64, 0]).max()
    assert err < 5e-3, err


def test_upsample_preserves_tone_frequency():
    """A tone at f stays at f after 2x upsampling (in the new rate)."""
    n = 1024
    f_bin = 100
    x = np.sin(2 * np.pi * f_bin * np.arange(n) / n).astype(np.float32)
    y = np.asarray(upsample2x(jnp.asarray(x[None, :, None])))[0, :, 0]
    assert y.shape[0] == 2 * n
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak = spec.argmax()
    assert abs(peak - f_bin) <= 1  # same absolute frequency
    # alias image at 2n-f suppressed by > 40 dB
    image = spec[2 * n // 2 - f_bin]
    assert image < spec[peak] * 1e-2


def test_snake_activation_formula():
    """At unit alpha/beta (logscale zeros), snake(x) = x + sin²(x) —
    checked through the up/down wrapper on smooth input."""
    model = SnakeActivation1d(channels=1, variant="snakebeta", logscale=True)
    x = (0.1 * np.sin(2 * np.pi * 3 * np.arange(512) / 512)).astype(np.float32)
    xj = jnp.asarray(x[None, :, None])
    params = model.init(jax.random.key(0), xj)
    y = np.asarray(model.apply(params, xj))[0, :, 0]
    expected = x + np.sin(x) ** 2
    assert np.abs(y[32:-32] - expected[32:-32]).max() < 1e-3


def test_generator_shape_and_finite():
    model = BigVGAN(cfg=TINY)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 20, 17)), jnp.float32
    )
    params = model.init(jax.random.key(0), mel)
    wav = np.asarray(model.apply(params, mel))
    assert wav.shape == (2, 17 * TINY.total_upsample)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0  # final clamp


def test_decode_frame_mask():
    model = BigVGAN(cfg=TINY)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 20, 12)), jnp.float32
    )
    params = model.init(jax.random.key(0), mel)
    mask = jnp.zeros((1, 12), bool).at[:, :8].set(True)
    wav = np.asarray(model.apply(params, mel, mask, method=BigVGAN.decode))
    up = TINY.total_upsample
    assert (wav[0, 8 * up :] == 0).all()
    assert np.abs(wav[0, : 8 * up]).max() > 0


def test_converter_folds_weight_norm():
    """Build a torch-layout state dict with weight_g/weight_v and verify the
    converted params drive the flax generator; folded kernels match g·v/‖v‖."""
    rng = np.random.default_rng(2)
    c = TINY
    sd = {}

    def wn(name, shape, transpose=False):
        v = rng.standard_normal(shape).astype(np.float32)
        g = rng.uniform(0.5, 1.5, (shape[0], 1, 1)).astype(np.float32)
        sd[f"{name}.weight_g"] = g
        sd[f"{name}.weight_v"] = v
        sd[f"{name}.bias"] = rng.standard_normal(
            shape[1] if transpose else shape[0]
        ).astype(np.float32)

    wn("conv_pre", (c.upsample_initial_channel, c.num_mels, 7))
    ch = c.upsample_initial_channel
    n_res = len(c.resblock_kernel_sizes)
    for i, (r, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
        wn(f"ups.{i}.0", (ch, ch // 2, k), transpose=True)
        ch //= 2
        for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                         c.resblock_dilation_sizes)):
            base = f"resblocks.{i * n_res + j}"
            for d in range(len(rd)):
                wn(f"{base}.convs1.{d}", (ch, ch, rk))
                wn(f"{base}.convs2.{d}", (ch, ch, rk))
                for a in (2 * d, 2 * d + 1):
                    sd[f"{base}.activations.{a}.act.alpha"] = rng.standard_normal(ch).astype(np.float32) * 0.1
                    sd[f"{base}.activations.{a}.act.beta"] = rng.standard_normal(ch).astype(np.float32) * 0.1
    sd["activation_post.act.alpha"] = rng.standard_normal(ch).astype(np.float32) * 0.1
    sd["activation_post.act.beta"] = rng.standard_normal(ch).astype(np.float32) * 0.1
    sd["conv_post.weight_g"] = rng.uniform(0.5, 1.5, (1, 1, 1)).astype(np.float32)
    sd["conv_post.weight_v"] = rng.standard_normal((1, ch, 7)).astype(np.float32)

    params = {"params": convert_bigvgan(sd, c)}
    # folded kernel matches g·v/‖v‖ for conv_pre
    v, g = sd["conv_pre.weight_v"], sd["conv_pre.weight_g"]
    expect = g * v / np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(
        np.transpose(params["params"]["conv_pre"]["kernel"], (2, 1, 0)),
        expect, rtol=1e-6,
    )
    model = BigVGAN(cfg=c)
    mel = jnp.asarray(rng.standard_normal((1, c.num_mels, 9)), jnp.float32)
    wav = np.asarray(model.apply(params, mel))
    assert wav.shape == (1, 9 * c.total_upsample) and np.isfinite(wav).all()


def test_for_hop_reproduces_published_config():
    c = BigVGANConfig.for_hop(256)
    assert c.upsample_rates == (4, 4, 2, 2, 2, 2)
    assert c.upsample_kernel_sizes == (8, 8, 4, 4, 4, 4)
    assert BigVGANConfig.for_hop(64).total_upsample == 64


@pytest.mark.slow
def test_api_with_bigvgan_vocoder(tmp_path):
    import warnings

    import yaml

    from lemas_tts_tpu.api import TTS
    from lemas_tts_tpu.utils.audio_io import write_wav

    cfg = {"model": {"name": "t", "backbone": "DiT", "tokenizer": "custom",
                     "tokenizer_path": "",
                     "arch": {"dim": 48, "depth": 2, "heads": 4, "dim_head": 12,
                              "ff_mult": 2, "text_dim": 24, "conv_layers": 1},
                     "mel_spec": {"target_sample_rate": 8000,
                                  "n_mel_channels": 20, "hop_length": 64,
                                  "win_length": 256, "n_fft": 256,
                                  "mel_spec_type": "bigvgan"},
                     "vocoder": {"is_local": True, "local_path": "/nonexistent",
                                 "name": "bigvgan"}}}
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join([" "] + list("abcdefghijklmnopqrstuvwxyz")
                               + ["(en)", "_", ",", "."]) + "\n")
    sr = 8000
    t = np.arange(sr) / sr
    write_wav(str(tmp_path / "ref.wav"),
              (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    with pytest.warns(UserWarning):
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("always")
            tts = TTS(model=str(cfg_path), vocab_file=str(vocab), device="cpu")
    wave, out_sr, _ = tts.infer(str(tmp_path / "ref.wav"), "abc", "def",
                                nfe_step=2, cfg_strength=1.0, seed=1,
                                show_info=lambda *a, **k: None)
    assert out_sr == sr and wave.size > 0 and np.isfinite(wave).all()
