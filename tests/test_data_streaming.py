"""Training data loader + streaming synthesis tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemas_tts_tpu.cfm.data import DataLoader, collate, frame_budget_batches
from lemas_tts_tpu.config import TrainConfig
from lemas_tts_tpu.utils.misc import repetition_found, seed_everything


def _dataset(n=40, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        t = int(rng.integers(20, 200))
        out.append({
            "mel": rng.standard_normal((t, 8)).astype(np.float32),
            "text": rng.integers(0, 20, rng.integers(3, 12)).astype(np.int32),
            "lang": int(rng.integers(0, 12)),
        })
    return out


def test_frame_budget_batches_respect_budget():
    lengths = [int(x) for x in np.random.default_rng(0).integers(20, 200, 100)]
    budget, max_samples = 1000, 8
    batches = frame_budget_batches(lengths, budget, max_samples, shuffle_seed=1)
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(100))  # every sample exactly once
    for b in batches:
        assert len(b) <= max_samples
        padded = len(b) * max(lengths[i] for i in b)
        assert padded <= budget or len(b) == 1  # singletons may exceed


def test_collate_shapes_and_padding():
    ds = _dataset(5)
    batch = collate(ds)
    B = 5
    assert batch["mel"].shape[0] == B
    assert batch["mel"].shape[1] >= max(s["mel"].shape[0] for s in ds)
    assert (batch["text"] == -1).any()  # pad value
    for i, s in enumerate(ds):
        t = s["mel"].shape[0]
        assert batch["mel_lengths"][i] == t
        np.testing.assert_array_equal(batch["mel"][i, :t], s["mel"])
        assert (batch["mel"][i, t:] == 0).all()


def test_dataloader_epoch_and_prefetch():
    ds = _dataset(30)
    cfg = TrainConfig(batch_size_per_gpu=2000, batch_size_type="frame",
                      max_samples=8)
    dl = DataLoader(ds, cfg, seed=3, prefetch=2)
    n_samples = 0
    for batch in dl:
        assert batch["mel"].ndim == 3
        n_samples += int((batch["mel_lengths"] > 0).sum())
    assert n_samples == 30
    assert len(dl) >= 1


@pytest.mark.slow
def test_dataloader_feeds_trainer():
    import random

    from lemas_tts_tpu.cfm.train import Trainer
    from lemas_tts_tpu.config import DiTArch
    from lemas_tts_tpu.models.dit import DiT

    ds = _dataset(10)
    cfg = TrainConfig(batch_size_per_gpu=1500, max_samples=4,
                      num_warmup_updates=2)
    arch = DiTArch(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                   text_dim=16, conv_layers=1)
    tr = Trainer(DiT(arch=arch, mel_dim=8, text_num_embeds=20),
                 vocab_size=20, mel_dim=8, cfg=cfg, use_ctc=False)
    dl = DataLoader(ds, cfg, seed=0)
    it = iter(dl)
    batch = next(it)
    state = tr.init_state(jax.random.key(0), batch)
    state, metrics = tr.train_step(state, batch, jax.random.key(1),
                                   random.Random(0))
    assert np.isfinite(float(metrics["loss"]))


def test_streaming_synthesis(tmp_path):
    """synthesize_stream yields one wave per chunk, in order, matching the
    non-streamed per-chunk parts."""
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
    dparams = dit.init(key, jnp.zeros((1, 32, 20)), jnp.zeros((1, 32, 20)),
                       jnp.zeros((1, 8), jnp.int32), jnp.zeros((1,)))
    voc = Vocos(input_channels=20, dim=32, intermediate_dim=64, num_layers=2,
                n_fft=256, hop_length=64)
    vparams = voc.init(key, jnp.zeros((1, 20, 16)))
    synth = Synthesizer(dit, dparams, voc, vparams, vocab, mel_cfg)

    sr = 8000
    ref = (0.2 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)).astype(np.float32)
    cfg = SamplerConfig(nfe_steps=2, cfg_strength=1.0, max_duration=512)
    chunks = [list("abc"), list("fgh"), list("ij")]
    streamed = list(synth.synthesize_stream(ref, sr, list("ab"), chunks,
                                            cfg=cfg, seed=5, chunk_batch=2))
    assert len(streamed) == 3
    for w, out_sr in streamed:
        assert out_sr == sr and w.size > 0 and np.isfinite(w).all()
    parts, _, _ = synth.synthesize_chunks(ref, sr, list("ab"), chunks,
                                          cfg=cfg, seed=5, return_parts=True)
    # first mini-batch (2 chunks) matches the 3-chunk batched parts exactly
    # only if batch bucketing matches; check count + finiteness instead and
    # bit-equality for the final chunk (same bucket: batch pad to 2 vs 4)
    assert len(parts) == 3
    # chunk_batch == len(chunks): the stream's single (double-buffered)
    # mini-batch IS the batched call — outputs must be bit-equal
    one_batch = list(synth.synthesize_stream(ref, sr, list("ab"), chunks,
                                             cfg=cfg, seed=5, chunk_batch=3))
    for (w, out_sr), p in zip(one_batch, parts):
        assert out_sr == sr and np.array_equal(w, p)
    # empty input: no yields, and the batched path returns empty wave/mel
    assert list(synth.synthesize_stream(ref, sr, list("ab"), [], cfg=cfg)) == []
    w0, _, m0 = synth.synthesize_chunks(ref, sr, list("ab"), [], cfg=cfg)
    assert w0.size == 0 and m0.shape == (20, 0)

    # --- TTFB controls (docs/serving.md "Streaming TTFB") ---
    # first_chunk_batch=1: grouping [1, 2] — chunk 0 matches a solo batched
    # call; chunks 1-2 match a batched call over that pair (the stream is
    # bit-exact vs batched AT MATCHING GROUPING)
    fast = list(synth.synthesize_stream(ref, sr, list("ab"), chunks,
                                        cfg=cfg, seed=5, chunk_batch=2,
                                        first_chunk_batch=1))
    assert len(fast) == 3
    solo0, _, _ = synth.synthesize_chunks(ref, sr, list("ab"), chunks[:1],
                                          cfg=cfg, seed=5, return_parts=True)
    assert np.array_equal(fast[0][0], solo0[0])
    pair, _, _ = synth.synthesize_chunks(ref, sr, list("ab"), chunks[1:],
                                         cfg=cfg, seed=5, return_parts=True)
    for (w, _), p in zip(fast[1:], pair):
        assert np.array_equal(w, p)

    # first_chunk_cfg: only chunk 0's sampler settings change — later
    # chunks remain identical to the plain fast stream
    fcfg = SamplerConfig(nfe_steps=1, cfg_strength=1.0, max_duration=512)
    ramp = list(synth.synthesize_stream(ref, sr, list("ab"), chunks,
                                        cfg=cfg, seed=5, chunk_batch=2,
                                        first_chunk_batch=1,
                                        first_chunk_cfg=fcfg))
    assert not np.array_equal(ramp[0][0], fast[0][0])  # NFE ramp took effect
    for (wr, _), (wf, _) in zip(ramp[1:], fast[1:]):
        assert np.array_equal(wr, wf)


def test_misc_utils():
    key = seed_everything(42)
    import jax.random as jr

    assert jr.normal(key, ()).shape == ()
    assert repetition_found("ababababababababababababab", length=2, tolerance=10)
    assert not repetition_found("the quick brown fox", length=2, tolerance=10)
