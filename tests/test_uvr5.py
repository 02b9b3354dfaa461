"""UVR5 MDX-Net subsystem tests: conversion parity, STFT packing round-trip,
demix chunking, ONNX initializer parsing."""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.uvr5.inference import MDXSeparator, UVR5
from lemas_tts_tpu.uvr5.mdxnet import (
    ConvTDFNet,
    MDXConfig,
    convert_convtdfnet,
    infer_config_from_state_dict,
)

TINY = MDXConfig(dim_c=4, dim_f=24, dim_t=16, n_fft=64, hop=16,
                 num_blocks=5, l=2, g=4, k=3, bn=2, bias=False, norm="group")


def test_conversion_parity_vs_torch():
    torch = pytest.importorskip("torch")
    from tests.torch_ref.mdxnet_torch import ConvTDFNetTorch

    tm = ConvTDFNetTorch(TINY.dim_c, TINY.dim_f, TINY.num_blocks, TINY.l,
                         TINY.g, TINY.k, TINY.bn, TINY.bias)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = infer_config_from_state_dict(sd, n_fft=TINY.n_fft, hop=TINY.hop,
                                       dim_t=TINY.dim_t)
    assert cfg.g == TINY.g and cfg.l == TINY.l and cfg.bn == TINY.bn
    assert cfg.num_blocks == TINY.num_blocks and cfg.dim_f == TINY.dim_f
    assert cfg.bias == TINY.bias

    params = {"params": convert_convtdfnet(sd, cfg)}
    model = ConvTDFNet(cfg=cfg)

    rng = np.random.default_rng(0)
    x_t = rng.standard_normal((2, TINY.dim_c, TINY.dim_f, TINY.dim_t)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x_t)).numpy()  # [B, C, F, T]
    x_j = jnp.asarray(np.transpose(x_t, (0, 3, 2, 1)))  # [B, T, F, C]
    ours = np.asarray(model.apply(params, x_j))
    ours = np.transpose(ours, (0, 3, 2, 1))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def _pb_varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def _pb_field(num: int, wire: int, payload) -> bytes:
    tag = _pb_varint((num << 3) | wire)
    if wire == 0:
        return tag + _pb_varint(payload)
    return tag + _pb_varint(len(payload)) + payload


def _tensorproto(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _pb_field(1, 0, d)  # dims
    msg += _pb_field(2, 0, 1)  # data_type FLOAT
    msg += _pb_field(8, 2, name.encode())
    msg += _pb_field(9, 2, arr.astype(np.float32).tobytes())
    return msg


def test_onnx_initializer_parse(tmp_path):
    """Parse a hand-serialized ONNX ModelProto (independent encoder here;
    torch.onnx export needs the onnx package, absent in this env)."""
    from lemas_tts_tpu.uvr5.onnx_weights import load_onnx_initializers

    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 4, 1, 1)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    graph = (
        _pb_field(5, 2, _tensorproto("first_conv.0.weight", w))
        + _pb_field(5, 2, _tensorproto("first_conv.0.bias", b))
        + _pb_field(2, 2, b"graphname")  # unrelated field, must be skipped
    )
    model = _pb_field(1, 0, 8) + _pb_field(7, 2, graph)  # ir_version + graph
    p = tmp_path / "m.onnx"
    p.write_bytes(model)

    init = load_onnx_initializers(str(p))
    assert set(init) == {"first_conv.0.weight", "first_conv.0.bias"}
    np.testing.assert_allclose(init["first_conv.0.weight"], w)
    np.testing.assert_allclose(init["first_conv.0.bias"], b)


@pytest.fixture(scope="module")
def sep():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return MDXSeparator.random_init(TINY, is_denoise=True, batch_size=4)


def test_match_mix_roundtrip(sep):
    """is_match_mix skips the network: demix ≈ identity up to the zeroed
    low-frequency bins and cropped top bins — a strong check of the packed
    STFT/iSTFT pipeline (stft:206-212, istft:214-222)."""
    sr = 44100
    t = np.arange(sep.gen_size * 3) / sr
    # energy in bins 3..dim_f: mid-frequency tone at bin ~12 of 33
    hz = 12 * sr / TINY.n_fft
    x = np.stack([np.sin(2 * np.pi * hz * t), np.cos(2 * np.pi * hz * t)]).astype(np.float32) * 0.5
    out = sep.demix({0: x}, is_match_mix=True)
    assert out.shape[0] == 2
    n = min(out.shape[1], x.shape[1])
    err = np.abs(out[:, 64:n - 64] - x[:, 64:n - 64]).max()
    assert err < 5e-2, err


def test_demix_output_shape(sep):
    rng = np.random.default_rng(1)
    x = (0.1 * rng.standard_normal((2, sep.gen_size * 2 + 123))).astype(np.float32)
    out = sep.demix({0: x})
    assert out.shape[0] == 2
    assert out.shape[1] >= x.shape[1]
    assert np.isfinite(out).all()


def test_denoise_sign_flip_is_even(sep):
    """The denoise average 0.5*(f(x) − f(−x)) is an odd-symmetrized operator:
    running it on −x must give exactly −output."""
    rng = np.random.default_rng(2)
    spek = jnp.asarray(rng.standard_normal((1, TINY.dim_t, TINY.dim_f, 4)),
                       jnp.float32)
    a = np.asarray(sep._run(sep.params, spek))
    b = np.asarray(sep._run(sep.params, -spek))
    np.testing.assert_allclose(a, -b, rtol=1e-5, atol=1e-6)


def test_uvr5_facade_denoise(tmp_path, sep):
    from lemas_tts_tpu.utils.audio_io import write_wav

    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "in.wav"
    write_wav(str(p), wav, sr)
    uvr = UVR5(separator=sep)  # tiny separator (flagship random init is slow)
    out_path = uvr.denoise_file(str(p), str(tmp_path / "out.wav"))
    from lemas_tts_tpu.utils.audio_io import read_audio

    den, out_sr = read_audio(out_path)
    assert out_sr == 44100
    den = np.squeeze(den)
    assert den.ndim == 1 and den.size > 0 and np.isfinite(den).all()


def test_mixer_shapes_and_conversion():
    from lemas_tts_tpu.uvr5.mdxnet import Mixer, convert_mixer

    rng = np.random.default_rng(5)
    n_stems, T = 4, 100
    w = rng.standard_normal((n_stems * 2, (n_stems + 1) * 2)).astype(np.float32)
    params = {"params": convert_mixer({"linear.weight": w})}
    x = jnp.asarray(rng.standard_normal((n_stems + 1, 2, T)), jnp.float32)
    out = np.asarray(Mixer(n_stems=n_stems).apply(params, x))
    assert out.shape == (n_stems, 2, T)
    # matches the explicit linear blend
    flat = np.asarray(x).reshape((n_stems + 1) * 2, T)
    expect = (w @ flat).reshape(n_stems, 2, T)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)
