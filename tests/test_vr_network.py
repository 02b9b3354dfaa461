"""UVR5 VR-arch (CascadedNet) tests."""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.uvr5.vr_network import (
    CascadedNet,
    VRSeparator,
    bilinear_2x_align_corners,
    crop_center,
)


def test_bilinear_align_corners_matches_torch_semantics():
    # hand-checked: align_corners=True keeps endpoints exact
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
    y = np.asarray(bilinear_2x_align_corners(x))[0, :, :, 0]
    assert y.shape == (4, 4)
    np.testing.assert_allclose(y[0, 0], 0.0)
    np.testing.assert_allclose(y[-1, -1], 3.0)
    np.testing.assert_allclose(y[0, -1], 1.0)
    np.testing.assert_allclose(y[-1, 0], 2.0)
    # midpoints interpolate linearly: row 0 = [0, 1/3, 2/3, 1]
    np.testing.assert_allclose(y[0], [0, 1 / 3, 2 / 3, 1], rtol=1e-6)
    if pytest.importorskip("torch") is not None:
        import torch
        import torch.nn.functional as F

        ref = F.interpolate(
            torch.arange(4.0).reshape(1, 1, 2, 2), scale_factor=2,
            mode="bilinear", align_corners=True,
        )[0, 0].numpy()
        np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_crop_center():
    skip = jnp.ones((1, 10, 12, 3))
    target = jnp.zeros((1, 6, 8, 3))
    out = crop_center(skip, target)
    assert out.shape == (1, 6, 8, 3)


@pytest.fixture(scope="module")
def vr():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return VRSeparator(n_fft=256, hop=128, nout=8, nout_lstm=16)


def test_cascaded_net_mask_shape_and_range(vr):
    n_bins = 256 // 2 + 1
    x = jnp.asarray(
        np.abs(np.random.default_rng(0).standard_normal((1, 2, n_bins, 16))),
        jnp.float32,
    )
    mask = np.asarray(vr._run(vr.params, x))
    assert mask.shape == (1, 2, n_bins, 16)
    assert (mask >= 0).all() and (mask <= 1).all()  # sigmoid mask


def test_vr_separate_end_to_end(vr):
    sr = 16000
    t = np.arange(sr) / sr
    x = np.stack([np.sin(2 * np.pi * 440 * t),
                  np.sin(2 * np.pi * 660 * t)]).astype(np.float32) * 0.4
    out = vr.separate(x, sr)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    # sigmoid mask ≤ 1 → output energy bounded by input (within OLA tolerance)
    assert np.abs(out).max() <= np.abs(x).max() * 1.5
