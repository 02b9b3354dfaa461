"""Sequence-parallel sampling (parallel/sequence, ops/ring_attention).

All on the 8-device virtual CPU mesh (conftest): ring attention vs one-shot
SDPA, halo convs vs the global SAME chain, and the full sequence-parallel
sampler vs the single-device sampler with identical params and noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lemas_tts_tpu.parallel.sequence import (
    make_seq_mesh,
    sequence_parallel_sampler,
)


def _shard_map(f, mesh, in_specs, out_specs):
    from jax import shard_map as sm

    return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              check_vma=False)


def test_ring_attention_matches_sdpa():
    from lemas_tts_tpu.ops.attention import sdpa
    from lemas_tts_tpu.ops.ring_attention import ring_attention

    rng = np.random.default_rng(0)
    B, H, N, dh = 2, 4, 128, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, dh)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(rng.random((B, N)) > 0.2)

    ref = sdpa(q, k, v, mask)

    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("seq",))
    qs = P(None, None, "seq", None)
    f = _shard_map(
        lambda q_, k_, v_, m_: ring_attention(q_, k_, v_, m_, "seq"),
        mesh, in_specs=(qs, qs, qs, P(None, "seq")), out_specs=qs,
    )
    out = jax.jit(f)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_fully_masked_rows_finite():
    """A batch row whose keys are ALL padded must degrade to uniform
    attention (sdpa semantics), not NaN."""
    from lemas_tts_tpu.ops.attention import sdpa
    from lemas_tts_tpu.ops.ring_attention import ring_attention

    rng = np.random.default_rng(1)
    B, H, N, dh = 2, 2, 64, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, dh)), jnp.float32)
               for _ in range(3))
    mask = np.ones((B, N), bool)
    mask[1] = False
    mask = jnp.asarray(mask)

    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("seq",))
    qs = P(None, None, "seq", None)
    f = _shard_map(
        lambda q_, k_, v_, m_: ring_attention(q_, k_, v_, m_, "seq"),
        mesh, in_specs=(qs, qs, qs, P(None, "seq")), out_specs=qs,
    )
    out = np.asarray(jax.jit(f)(q, k, v, mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.asarray(sdpa(q, k, v, mask)),
                               rtol=2e-5, atol=2e-5)


def test_halo_conv_matches_global():
    from lemas_tts_tpu.models.modules import ConvPositionEmbedding

    rng = np.random.default_rng(2)
    B, N, D = 2, 128, 32
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    ref_mod = ConvPositionEmbedding(D)
    params = ref_mod.init(jax.random.key(0), x)
    ref = ref_mod.apply(params, x)

    seq_mod = ConvPositionEmbedding(D, seq_axis="seq")
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("seq",))
    f = _shard_map(
        lambda p, x_: seq_mod.apply(p, x_),
        mesh, in_specs=(P(), P(None, "seq", None)),
        out_specs=P(None, "seq", None),
    )
    out = jax.jit(f)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _tiny_models():
    from lemas_tts_tpu.config import DiTArch
    from lemas_tts_tpu.models.dit import DiT

    arch = DiTArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                   text_dim=32, conv_layers=1)
    kw = dict(arch=arch, mel_dim=12, text_num_embeds=30)
    return DiT(**kw), DiT(**kw, seq_axis="seq")


@pytest.mark.parametrize("cfg_cutoff", [None, 0.8])
def test_sequence_parallel_sampler_matches_single(cfg_cutoff):
    from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler

    single, seq_model = _tiny_models()
    rng = np.random.default_rng(3)
    B, N, D = 2, 256, 12
    params = single.init(
        jax.random.key(0),
        jnp.zeros((1, 8, D)), jnp.zeros((1, 8, D)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )

    text = jnp.asarray(rng.integers(0, 30, (B, 6)).astype(np.int32))
    cond = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    cond_mask = np.zeros((B, N), bool)
    cond_mask[:, :64] = True
    cond_mask = jnp.asarray(cond_mask)
    duration = jnp.asarray(np.array([N, N - 80], np.int32))
    y0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    settings = SamplerSettings(steps=4, cfg_strength=2.0,
                               sway_sampling_coef=1.0, cfg_cutoff=cfg_cutoff)
    ref = make_sampler(single, settings)(
        params, cond, cond_mask, text, duration, y0)

    mesh = make_seq_mesh(8, seq_parallel=8)
    fn = sequence_parallel_sampler(seq_model, settings, mesh)
    out = fn(params, cond, cond_mask, text, duration, y0)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # kept frames are pasted bit-exactly in both paths
    np.testing.assert_array_equal(
        np.asarray(out)[:, :64], np.asarray(cond)[:, :64])


def test_synthesizer_seq_mesh_matches_unmeshed():
    """A Synthesizer on a ('data','seq') mesh produces the same audio as the
    unmeshed one (same seed) — the full pipeline path, not just the sampler."""
    from lemas_tts_tpu.config import DiTArch, MelSpecConfig, SamplerConfig
    from lemas_tts_tpu.infer.pipeline import Synthesizer
    from lemas_tts_tpu.models.dit import DiT
    from lemas_tts_tpu.models.vocos import Vocos
    from lemas_tts_tpu.utils.vocab import Vocab

    mel_cfg = MelSpecConfig(n_mel_channels=20, n_fft=256, win_length=256,
                            hop_length=64, target_sample_rate=8000)
    arch = DiTArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                   text_dim=32, conv_layers=1)
    vocab = Vocab(char_map={c: i for i, c in enumerate(" abcdefghij")}, size=11)
    dit = DiT(arch=arch, mel_dim=20, text_num_embeds=vocab.size)
    key = jax.random.key(0)
    dparams = dit.init(
        key, jnp.zeros((1, 32, 20)), jnp.zeros((1, 32, 20)),
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1,)),
    )
    voc = Vocos(input_channels=20, dim=32, intermediate_dim=64, num_layers=2,
                n_fft=256, hop_length=64)
    vparams = voc.init(key, jnp.zeros((1, 20, 16)))

    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=2.0, sway_sampling_coef=1.0,
                        max_duration=512)
    args = (ref, sr, list("abba"), [list("abc"), list("fgh")], cfg)

    base = Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg,
                       max_duration=512)
    wave0, _, mel0 = base.synthesize_chunks(*args, seed=0)

    mesh = make_seq_mesh(8, seq_parallel=4)
    seq = Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg,
                      max_duration=512, mesh=mesh)
    wave1, _, mel1 = seq.synthesize_chunks(*args, seed=0)

    np.testing.assert_allclose(wave1, wave0, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(mel1, mel0, rtol=1e-3, atol=1e-3)


def test_sequence_parallel_block_cache_matches_single():
    """The block-range residual cache composes with sequence parallelism:
    the schedule is statically segmented (no collectives under lax.cond —
    cfm/sampler._scan_block_cached), so the SP sampler with a cache spec
    must match the single-device cached sampler to float tolerance."""
    from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler

    single, seq_model = _tiny_models()
    rng = np.random.default_rng(5)
    B, N, D = 2, 256, 12
    params = single.init(
        jax.random.key(0),
        jnp.zeros((1, 8, D)), jnp.zeros((1, 8, D)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )
    text = jnp.asarray(rng.integers(0, 30, (B, 6)).astype(np.int32))
    cond = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    cond_mask = jnp.asarray(np.arange(N)[None, :] < 64).repeat(B, axis=0)
    duration = jnp.full((B,), N, jnp.int32)
    y0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    settings = SamplerSettings(steps=6, cfg_strength=2.0,
                               sway_sampling_coef=1.0, cfg_cutoff=0.8,
                               block_cache_range=(1, 2), block_cache_every=2,
                               block_cache_warm_tail=1)
    ref = make_sampler(single, settings)(
        params, cond, cond_mask, text, duration, y0)
    mesh = make_seq_mesh(8, seq_parallel=4)
    out = sequence_parallel_sampler(seq_model, settings, mesh)(
        params, cond, cond_mask, text, duration, y0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # the cache actually engaged (skip branch diverges from the exact path)
    exact = make_sampler(single, SamplerSettings(
        steps=6, cfg_strength=2.0, sway_sampling_coef=1.0, cfg_cutoff=0.8))(
        params, cond, cond_mask, text, duration, y0)
    assert float(np.max(np.abs(np.asarray(ref) - np.asarray(exact)))) > 0


def test_sequence_parallel_prosody_and_step_cond_match_single():
    """The round-3 exclusion is lifted: prosody conditioning (folded into
    the precomputed text embeds outside the shard_map) and GRL step_cond
    (sharded over 'seq' like cond) both match the single-device sampler."""
    from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler
    from lemas_tts_tpu.config import DiTArch
    from lemas_tts_tpu.models.dit import DiT

    arch = DiTArch(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                   text_dim=32, conv_layers=1)
    kw = dict(arch=arch, mel_dim=12, text_num_embeds=30,
              use_prosody_encoder=True)
    single = DiT(**kw)
    seq_model = DiT(**kw, seq_axis="seq")

    rng = np.random.default_rng(6)
    B, N, D = 2, 256, 12
    params = single.init(
        jax.random.key(0),
        jnp.zeros((1, 8, D)), jnp.zeros((1, 8, D)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
        prosody_text=jnp.zeros((1, 4, 512)),
    )
    text = jnp.asarray(rng.integers(0, 30, (B, 6)).astype(np.int32))
    cond = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    cond_mask = jnp.asarray(np.arange(N)[None, :] < 64).repeat(B, axis=0)
    duration = jnp.asarray(np.array([N, N - 80], np.int32))
    y0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    # GRL shuffle conditioning: per-frame [B, N, D] alternative cond
    step_cond = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    prosody_text = jnp.asarray(
        rng.standard_normal((B, 6, 512)).astype(np.float32) * 0.1)

    settings = SamplerSettings(steps=4, cfg_strength=2.0,
                               sway_sampling_coef=1.0)
    mesh = make_seq_mesh(8, seq_parallel=4)
    sp = sequence_parallel_sampler(seq_model, settings, mesh)
    ref_fn = make_sampler(single, settings)

    for sc, pt in [(step_cond, None), (None, prosody_text),
                   (step_cond, prosody_text)]:
        ref = ref_fn(params, cond, cond_mask, text, duration, y0, sc, pt)
        out = sp(params, cond, cond_mask, text, duration, y0,
                 step_cond=sc, prosody_text=pt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
    # the conditioning actually flowed (paths diverge from the plain run)
    plain = ref_fn(params, cond, cond_mask, text, duration, y0)
    both = sp(params, cond, cond_mask, text, duration, y0,
              step_cond=step_cond, prosody_text=prosody_text)
    assert float(np.max(np.abs(np.asarray(both) - np.asarray(plain)))) > 1e-3


def test_sequence_parallel_data_axis_combo():
    """2 data × 4 seq: batch rows AND their sequences shard simultaneously."""
    from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler

    single, seq_model = _tiny_models()
    rng = np.random.default_rng(4)
    B, N, D = 4, 128, 12
    params = single.init(
        jax.random.key(0),
        jnp.zeros((1, 8, D)), jnp.zeros((1, 8, D)),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)),
    )
    text = jnp.asarray(rng.integers(0, 30, (B, 5)).astype(np.int32))
    cond = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    cond_mask = jnp.asarray(np.arange(N)[None, :] < 32).repeat(B, axis=0)
    duration = jnp.full((B,), N, jnp.int32)
    y0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    settings = SamplerSettings(steps=2, cfg_strength=1.0,
                               sway_sampling_coef=1.0)
    ref = make_sampler(single, settings)(
        params, cond, cond_mask, text, duration, y0)
    mesh = make_seq_mesh(8, seq_parallel=4)
    out = sequence_parallel_sampler(seq_model, settings, mesh)(
        params, cond, cond_mask, text, duration, y0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
