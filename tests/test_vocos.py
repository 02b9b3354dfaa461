"""Vocos vocoder parity: JAX decode vs torch mirror with converted weights."""

import numpy as np
import torch

import jax.numpy as jnp

from lemas_tts_tpu.models.vocos import Vocos, convert_vocos
from tests.torch_ref.vocos_torch import VocosRef


def test_vocos_decode_parity():
    torch.manual_seed(0)
    cfg = dict(in_ch=16, dim=32, inter=64, layers=3, n_fft=64, hop=16)
    tref = VocosRef(**cfg)
    sd = tref.state_dict()
    g = torch.Generator().manual_seed(5)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.1
    tref.load_state_dict(sd)
    tref.eval()

    mel = torch.randn(2, 16, 40, generator=g)
    with torch.no_grad():
        ref = tref.decode(mel).numpy()

    jmodel = Vocos(input_channels=16, dim=32, intermediate_dim=64, num_layers=3,
                   n_fft=64, hop_length=16)
    params = {"params": convert_vocos({k: v.numpy() for k, v in tref.ckpt_state_dict().items()})}
    ours = np.asarray(jmodel.apply(params, jnp.asarray(mel.numpy()), method=Vocos.decode))

    assert ours.shape == ref.shape == (2, 39 * 16)
    # exp-magnitudes make this scale-sensitive; compare relatively
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.max(np.abs(ours - ref)) / denom < 2e-4


def test_vocos_masked_padded_decode_equals_exact():
    """Bucket-padded decode with frame_mask == exact-length decode (enables
    batched vocoding of variable-length chunks on TPU)."""
    import jax

    cfg = dict(input_channels=8, dim=16, intermediate_dim=32, num_layers=2,
               n_fft=32, hop_length=8)
    jmodel = Vocos(**cfg)
    rng = np.random.default_rng(1)
    T_exact, T_pad = 25, 40
    mel_exact = rng.standard_normal((1, 8, T_exact)).astype(np.float32)
    params = jmodel.init(jax.random.key(0), jnp.asarray(mel_exact))

    exact = np.asarray(jmodel.apply(params, jnp.asarray(mel_exact), method=Vocos.decode))

    mel_pad = np.zeros((1, 8, T_pad), dtype=np.float32)
    mel_pad[:, :, :T_exact] = mel_exact
    mask = (np.arange(T_pad)[None, :] < T_exact)
    padded = np.asarray(jmodel.apply(params, jnp.asarray(mel_pad), jnp.asarray(mask),
                                     method=Vocos.decode))

    n_valid = (T_exact - 1) * cfg["hop_length"]
    np.testing.assert_allclose(padded[:, :n_valid], exact, atol=1e-5)
