"""Alternate backbones (MMDiT, UNetT): forward shapes, masking, and sampler
interchangeability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler, sway_time_grid
from lemas_tts_tpu.models.mmdit import MMDiT
from lemas_tts_tpu.models.unett import UNetT

B, N, NT, MEL = 2, 32, 12, 16
VOCAB = 30


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, MEL)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, N, MEL)), jnp.float32)
    text = jnp.asarray(rng.integers(-1, VOCAB, (B, NT)), jnp.int32)
    time = jnp.asarray([0.3, 0.7], jnp.float32)
    mask = jnp.asarray([[True] * N, [True] * 20 + [False] * (N - 20)])
    return x, cond, text, time, mask


@pytest.fixture(scope="module")
def mmdit():
    model = MMDiT(dim=48, depth=3, heads=4, dim_head=12, ff_mult=2,
                  mel_dim=MEL, text_num_embeds=VOCAB)
    x, cond, text, time, mask = _inputs()
    params = model.init(jax.random.key(0), x, cond, text, time, mask)
    return model, params


@pytest.fixture(scope="module")
def unett():
    model = UNetT(dim=48, depth=4, heads=4, dim_head=12, ff_mult=2,
                  mel_dim=MEL, text_num_embeds=VOCAB, text_dim=24,
                  conv_layers=1)
    x, cond, text, time, mask = _inputs()
    params = model.init(jax.random.key(0), x, cond, text, time, mask)
    return model, params


@pytest.mark.parametrize("which", ["mmdit", "unett"])
def test_forward_shape_and_finite(which, request):
    model, params = request.getfixturevalue(which)
    x, cond, text, time, mask = _inputs(1)
    out = model.apply(params, x, cond, text, time, mask)
    assert out.shape == (B, N, MEL)
    assert np.isfinite(np.asarray(out)).all()
    # CFG drop variants give different outputs
    out_drop = model.apply(params, x, cond, text, time, mask,
                           drop_audio_cond=True, drop_text=True)
    assert not np.allclose(np.asarray(out), np.asarray(out_drop))


@pytest.mark.parametrize("which", ["mmdit", "unett"])
def test_hoisted_text_embed_matches_inline(which, request):
    model, params = request.getfixturevalue(which)
    x, cond, text, time, mask = _inputs(2)
    te = model.apply(params, text, N, False, method=model.embed_text)
    hoisted = model.apply(params, x, cond, None, time, mask, text_embed=te)
    inline = model.apply(params, x, cond, text, time, mask)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(inline),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("which", ["mmdit", "unett"])
def test_sampler_drives_alt_backbone(which, request):
    model, params = request.getfixturevalue(which)
    settings = SamplerSettings(steps=2, cfg_strength=2.0)
    run = make_sampler(model, settings)
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((B, N, MEL)), jnp.float32)
    cond_mask = jnp.asarray(
        np.arange(N)[None, :] < np.asarray([10, 14])[:, None]
    )
    text = jnp.asarray(rng.integers(-1, VOCAB, (B, NT)), jnp.int32)
    duration = jnp.asarray([N, N - 8], jnp.int32)
    y0 = jnp.asarray(rng.standard_normal((B, N, MEL)), jnp.float32)
    out = run(params, cond, cond_mask, text, duration, y0)
    out = np.asarray(out)
    assert out.shape == (B, N, MEL) and np.isfinite(out).all()
    # keep-mask paste is bit-exact
    np.testing.assert_array_equal(out[0, :10], np.asarray(cond)[0, :10])


def test_unett_skip_types():
    x, cond, text, time, mask = _inputs(4)
    for skip in ("add", "none"):
        model = UNetT(dim=32, depth=2, heads=2, dim_head=16, mel_dim=MEL,
                      text_num_embeds=VOCAB, text_dim=16,
                      skip_connect_type=skip)
        params = model.init(jax.random.key(1), x, cond, text, time, mask)
        out = model.apply(params, x, cond, text, time, mask)
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_api_with_mmdit_backbone(tmp_path):
    import warnings
    from pathlib import Path

    from lemas_tts_tpu.api import TTS
    from lemas_tts_tpu.utils.audio_io import write_wav

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join([" "] + list("abcdefghijklmnopqrstuvwxyz")
                               + ["(en)", "_", ",", "."]) + "\n")
    sr = 8000
    t = np.arange(sr) / sr
    write_wav(str(tmp_path / "ref.wav"),
              (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = TTS(model=str(Path(__file__).parent / "data" / "tiny_mmdit.yaml"),
                  vocab_file=str(vocab), device="cpu")
    w, out_sr, _ = tts.infer(str(tmp_path / "ref.wav"), "abc", "def ghi",
                             nfe_step=2, cfg_strength=1.0, seed=1,
                             show_info=lambda *a, **k: None)
    assert out_sr == sr and w.size > 0 and np.isfinite(w).all()


def test_mmdit_mask_excludes_padded_keys(mmdit):
    """Perturbing *masked* frames must not change valid outputs beyond the
    conv-pos-embedding receptive field (attention itself is fully masked)."""
    model, params = mmdit
    x, cond, text, time, mask = _inputs(5)
    out = np.asarray(model.apply(params, x, cond, text, time, mask))
    x2 = x.at[1, 20:].add(100.0)  # garbage in padded region of sample 1
    out2 = np.asarray(model.apply(params, x2, cond, text, time, mask))
    # sample 0 untouched entirely
    np.testing.assert_allclose(out2[0], out[0], rtol=1e-5, atol=1e-5)
    # without the mask the garbage leaks through attention into early frames
    out3 = np.asarray(model.apply(params, x2, cond, text, time, None))
    d_masked = np.abs(out2[1, :4] - out[1, :4]).max()
    d_unmasked = np.abs(out3[1, :4] - out[1, :4]).max()
    assert d_unmasked > d_masked
