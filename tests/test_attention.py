"""Attention kernel parity: the Pallas VMEM kernel (interpret mode on CPU)
must match XLA SDPA bit-closely, with and without key-padding masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.ops.attention import attention, sdpa, vmem_attention


def _qkv(B=2, H=4, N=128, D=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, H, N, D)), dtype)
    return mk(), mk(), mk()


def test_vmem_matches_sdpa_unmasked():
    q, k, v = _qkv()
    ref = np.asarray(sdpa(q, k, v))
    got = np.asarray(vmem_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_vmem_matches_sdpa_masked():
    q, k, v = _qkv(seed=1)
    mask = jnp.asarray(np.arange(128)[None, :] < np.asarray([80, 128])[:, None])
    ref = np.asarray(sdpa(q, k, v, mask))
    got = np.asarray(vmem_attention(q, k, v, mask, interpret=True))
    # valid queries must match; padded-query rows are zeroed later by the
    # caller (modules.py Attention), so compare only the valid region
    np.testing.assert_allclose(got[0, :, :80], ref[0, :, :80],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-5, atol=2e-5)


def test_vmem_bf16():
    q, k, v = _qkv(seed=2, dtype=jnp.bfloat16)
    ref = np.asarray(sdpa(q, k, v), np.float32)
    got = np.asarray(vmem_attention(q, k, v, interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_vmem_multi_qblock():
    """N large enough that the kernel tiles queries into multiple blocks."""
    q, k, v = _qkv(B=1, H=2, N=256, D=64, seed=3)
    mask = jnp.asarray(np.arange(256)[None, :] < 200)
    ref = np.asarray(sdpa(q, k, v, mask))
    got = np.asarray(vmem_attention(q, k, v, mask, interpret=True))
    np.testing.assert_allclose(got[:, :, :200], ref[:, :, :200],
                               rtol=2e-5, atol=2e-5)


def test_small_shapes_fall_back_to_sdpa():
    # N not a multiple of 128 → XLA path (same function, same results)
    q, k, v = _qkv(N=96, seed=4)
    ref = np.asarray(sdpa(q, k, v))
    got = np.asarray(attention(q, k, v, backend="vmem"))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def _nhd_ref(q, k, v, mask, angles, heads):
    """Split-head + external-rope reference for the flat-layout kernel."""
    from lemas_tts_tpu.ops.rope import apply_rope

    B, N, inner = q.shape
    D = inner // heads
    split = lambda t: t.reshape(B, N, heads, D).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    qh = apply_rope(qh, angles)
    kh = apply_rope(kh, angles)
    out = sdpa(qh, kh, vh, mask)
    return out.transpose(0, 2, 1, 3).reshape(B, N, inner)


@pytest.mark.parametrize("N,heads", [(128, 2), (256, 4)])
def test_vmem_nhd_matches_split_head(N, heads):
    from lemas_tts_tpu.ops.attention import vmem_attention_nhd
    from lemas_tts_tpu.ops.rope import rope_angles

    rng = np.random.default_rng(7)
    B, D = 2, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, heads * D)),
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(np.arange(N)[None, :] < np.asarray([N - 48, N])[:, None])
    angles = rope_angles(N, D)
    ref = np.asarray(_nhd_ref(q, k, v, mask, angles, heads))
    got = np.asarray(
        vmem_attention_nhd(q, k, v, mask, angles, heads=heads, interpret=True))
    np.testing.assert_allclose(got[0, : N - 48], ref[0, : N - 48],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-5, atol=2e-5)


def test_vmem_nhd_bf16():
    from lemas_tts_tpu.ops.attention import vmem_attention_nhd
    from lemas_tts_tpu.ops.rope import rope_angles

    rng = np.random.default_rng(8)
    B, N, heads, D = 1, 128, 2, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, heads * D)),
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    angles = rope_angles(N, D)
    ref = np.asarray(_nhd_ref(q, k, v, None, angles, heads), np.float32)
    got = np.asarray(
        vmem_attention_nhd(q, k, v, None, angles, heads=heads,
                           interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("N,heads", [(128, 2), (256, 3)])
def test_vmem_nhd_d128_matches_split_head(N, heads):
    """Wide-head geometry: one d128 head fills a full 128-lane program (no
    per-head lane masks, single score chain). Odd head counts are legal —
    the pair constraint only applies at d64."""
    from lemas_tts_tpu.ops.attention import nhd_supported, vmem_attention_nhd
    from lemas_tts_tpu.ops.rope import rope_angles

    assert nhd_supported(heads, 128, N)
    rng = np.random.default_rng(13)
    B, D = 2, 128
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, heads * D)),
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(np.arange(N)[None, :] < np.asarray([N - 48, N])[:, None])
    angles = rope_angles(N, D)
    ref = np.asarray(_nhd_ref(q, k, v, mask, angles, heads))
    got = np.asarray(
        vmem_attention_nhd(q, k, v, mask, angles, heads=heads, interpret=True))
    np.testing.assert_allclose(got[0, : N - 48], ref[0, : N - 48],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-5, atol=2e-5)


def test_vmem_nhd_d128_bf16_and_chunked():
    from lemas_tts_tpu.ops.attention import vmem_attention_nhd
    from lemas_tts_tpu.ops.rope import rope_angles

    rng = np.random.default_rng(14)
    B, N, heads, D = 1, 256, 2, 128
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, heads * D)),
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    angles = rope_angles(N, D)
    ref = np.asarray(_nhd_ref(q, k, v, None, angles, heads), np.float32)
    got = np.asarray(
        vmem_attention_nhd(q, k, v, None, angles, heads=heads,
                           interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)

    # kv-chunked online softmax on the single-head chain
    base = vmem_attention_nhd(q, k, v, None, angles, heads=heads,
                              interpret=True, block_q=128, block_kv=0)
    chunked = vmem_attention_nhd(q, k, v, None, angles, heads=heads,
                                 interpret=True, block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(chunked, np.float32),
                               np.asarray(base, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("N,heads,masked", [(128, 2, True), (256, 4, False)])
def test_vmem_nhd_pack_pair_matches_base(N, heads, masked):
    """Head-pair-packed variant (block-diagonal K/V concat, one score + one
    output matmul per pair) is numerically identical to the per-head-chain
    base kernel — it's the same math with the lane masks moved from q/out
    onto the concatenated operands."""
    from lemas_tts_tpu.ops.attention import vmem_attention_nhd
    from lemas_tts_tpu.ops.rope import rope_angles

    rng = np.random.default_rng(9)
    B, D = 2, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, heads * D)),
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(np.arange(N)[None, :] <
                       np.asarray([N - 48, N])[:, None]) if masked else None
    angles = rope_angles(N, D)
    base = np.asarray(vmem_attention_nhd(q, k, v, mask, angles, heads=heads,
                                         interpret=True))
    packed = np.asarray(vmem_attention_nhd(q, k, v, mask, angles, heads=heads,
                                           interpret=True, pack_pair=True))
    np.testing.assert_allclose(packed, base, rtol=1e-6, atol=1e-6)


def test_dispatch_backends():
    q, k, v = _qkv(N=64, seed=5)
    a = np.asarray(attention(q, k, v, backend="xla"))
    b = np.asarray(attention(q, k, v, backend="splash"))  # small N → sdpa
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_vmem_nhd_kv_chunked_matches_one_shot():
    """The flash-style kv-chunked online softmax (engaged at long N so bq can
    stay at 512 without a [512, N] f32 tile) must agree with the one-shot
    path — including a kv chunk that is masked in full (the running-max
    floor keeps exp() underflowing to 0 instead of the degenerate exp(0))."""
    from lemas_tts_tpu.ops.attention import vmem_attention_nhd
    from lemas_tts_tpu.ops.rope import rope_angles

    rng = np.random.default_rng(11)
    B, N, heads, D = 2, 512, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, heads * D)),
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    angles = rope_angles(N, D)
    mask = np.ones((B, N), bool)
    mask[0, 128:256] = False  # chunk 1 fully masked at bkv=128
    mask[1, 300:] = False  # prefix mask (lens_to_mask shape)
    mask = jnp.asarray(mask)

    base = vmem_attention_nhd(q, k, v, mask, angles, heads=heads,
                              interpret=True, block_q=128, block_kv=0)
    for bkv in (128, 256):
        got = vmem_attention_nhd(q, k, v, mask, angles, heads=heads,
                                 interpret=True, block_q=128, block_kv=bkv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=2e-5, atol=2e-5)


def test_vmem_nhd_kv_chunked_guards():
    """(a) A row whose keys are ALL masked must come out finite under
    chunking (the accumulator underflows to l=0 — clamped, not NaN).
    (b) A block_kv that does not divide N is rejected loudly instead of
    silently dropping the trailing keys."""
    import pytest

    from lemas_tts_tpu.ops.attention import vmem_attention_nhd
    from lemas_tts_tpu.ops.rope import rope_angles

    rng = np.random.default_rng(12)
    B, N, heads, D = 2, 256, 2, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, heads * D)),
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    angles = rope_angles(N, D)
    mask = np.ones((B, N), bool)
    mask[1] = False  # fully masked batch row
    out = vmem_attention_nhd(q, k, v, jnp.asarray(mask), angles, heads=heads,
                             interpret=True, block_q=128, block_kv=128)
    assert np.isfinite(np.asarray(out)).all()

    with pytest.raises(AssertionError):
        vmem_attention_nhd(q, k, v, None, angles, heads=heads,
                           interpret=True, block_q=128, block_kv=96)
