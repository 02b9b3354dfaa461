"""Synthesis engine: text chunking, batched sampling, vocoding, stitching.

TPU-first redesign of the reference orchestration (``utils_infer.py:399-625``):
the reference synthesizes text chunks concurrently via a ThreadPoolExecutor
(with a shared mutable text-cache data race, SURVEY.md §5); here chunks are
**packed into one batch dimension** and run through a single jitted sampler
call + one masked batch vocoder decode. Shapes are bucketed (duration, text
length, batch) so the set of compiled programs stays small; results are
independent of batch composition because all chunks share the seeded noise
prefix (mirroring the reference's per-sample re-seeding, ``cfm.py:430-435``).
"""

from __future__ import annotations

import logging
import re
import threading
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lemas_tts_tpu.cfm.sampler import (
    DURATION_BUCKETS,
    SamplerSettings,
    block_cache_fields,
    make_sampler,
    parse_block_cache,
    pick_bucket,
)
from lemas_tts_tpu.config import MelSpecConfig, SamplerConfig
from lemas_tts_tpu.models.vocos import Vocos
from lemas_tts_tpu.ops.mel import MelFrontend
from lemas_tts_tpu.ops.resample import resample
from lemas_tts_tpu.utils.vocab import Vocab, pad_text_batch, text_to_ids

logger = logging.getLogger(__name__)

TEXT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32)


@partial(jax.jit, static_argnames=("n", "d"))
def _batched_y0(seeds: jax.Array, n: int, d: int) -> jax.Array:
    """Per-row seeded noise [B, n, d] — bit-equal to stacking
    ``jax.random.normal(jax.random.key(seed), (n, d))`` per row."""
    return jax.vmap(
        lambda s: jax.random.normal(jax.random.key(s), (n, d), jnp.float32)
    )(seeds)


@partial(jax.jit, static_argnames=("n_out",))
def _slice_for_vocoder(mel, starts, lens, n_out: int):
    """Per-row [start, start+len) windows of ``mel [B, N, D]`` as one
    device-resident vocoder batch ([B, D, n_out], frame mask). Replaces the
    host round-trip (fetch mel → slice in numpy → re-upload) between the
    sampler and the vocoder."""
    B, N, D = mel.shape
    melp = jnp.pad(mel, ((0, 0), (0, n_out), (0, 0)))
    sl = jax.vmap(
        lambda m, s: jax.lax.dynamic_slice(m, (s, 0), (n_out, D))
    )(melp, starts)  # [B, n_out, D]
    mask = jnp.arange(n_out)[None, :] < lens[:, None]
    sl = jnp.where(mask[..., None], sl, 0.0)
    return jnp.swapaxes(sl, 1, 2), mask


def dispatch_warmup(synth, cfg: SamplerConfig = SamplerConfig(),
                    duration_buckets: Sequence[int] = (1024,),
                    batch_buckets: Sequence[int] = (1,),
                    max_text_chars: int = 20000) -> int:
    """Warm serving programs through the REAL dispatch path.

    :meth:`Synthesizer.warmup` compiles with synthetic arrays, but jit
    caches key on argument sharding/commitment — the first real dispatch
    re-traces the sampler even though the XLA executable is reused, which
    through a remote-device link costs seconds (measured: a warmed serving
    engine's first per-shape dispatches inflated loaded TTFB p99 from
    1.6 s to 10.5 s). This helper instead drives
    ``synth.synthesize_requests`` with synthetic requests whose estimated
    duration lands in each target bucket, padded to each batch bucket — so
    exactly the programs and cache entries real traffic hits are the ones
    warmed. Works on any engine-facing synthesizer (``Synthesizer`` or the
    multihost ``BroadcastSynthesizer`` — there the warm batches broadcast,
    warming the whole fleet). Returns the number of dispatches made;
    buckets unreachable with the synthetic reference are skipped, and
    non-bucket duration values are normalized to their bucket (a raw
    ``1000`` warms the 1024 bucket instead of silently warming nothing).

    Limitation: each duration bucket is warmed at the ONE text bucket the
    synthetic text lands in; real traffic whose text lengths span several
    ``TEXT_BUCKETS`` within a duration bucket still compiles those
    variants on first sight (warm with representative real requests for a
    hard zero-tail guarantee — ``latency_probe --loaded_ttfb`` does).
    """
    mel_cfg = getattr(synth, "mel_cfg", None) or synth.synth.mel_cfg
    sr = mel_cfg.target_sample_rate
    t = np.arange(2 * sr) / sr
    ref = (0.1 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    ref_units = "warm up reference audio."
    filler = "all warmup and no playback makes the first request slow ".split()
    n = 0
    duration_buckets = {pick_bucket(int(N), DURATION_BUCKETS)
                        for N in duration_buckets}
    for N in sorted(duration_buckets):
        gen = "warm. "
        # grow one word at a time: coarse growth can jump clean over a
        # narrow bucket (the estimate rounds up to the next bucket edge)
        w = 0
        while (synth.estimate_bucket(ref, sr, ref_units, gen, cfg) < N
               and len(gen) < max_text_chars):
            gen += filler[w % len(filler)] + " "
            w += 1
        if synth.estimate_bucket(ref, sr, ref_units, gen, cfg) != N:
            continue
        for B in batch_buckets:
            synth.synthesize_requests(
                [dict(ref_wav=ref, ref_sr=sr, ref_units=ref_units,
                      gen_units=gen, seed=i) for i in range(int(B))],
                cfg=cfg)
            n += 1
    return n


def chunk_text(text: str, max_chars: int = 135) -> List[str]:
    """Sentence-boundary chunking with a UTF-8 byte budget
    (reference ``chunk_text``, ``utils_infer.py:89-116``)."""
    chunks: List[str] = []
    current = ""
    sentences = re.split(r"(?<=[;:,.!?])\s+|(?<=[；：，。！？])", text)
    for sentence in sentences:
        if len(current.encode("utf-8")) + len(sentence.encode("utf-8")) <= max_chars:
            current += (
                sentence + " "
                if sentence and len(sentence[-1].encode("utf-8")) == 1
                else sentence
            )
        else:
            if current:
                chunks.append(current.strip())
            current = (
                sentence + " "
                if sentence and len(sentence[-1].encode("utf-8")) == 1
                else sentence
            )
    if current:
        chunks.append(current.strip())
    return chunks


def estimate_duration_frames(ref_frames: int, n_ref_units: int,
                             n_gen_units: int, speed: float) -> int:
    """Reference duration heuristic (``utils_infer.py:520-527``): generated
    length extrapolates the reference's frames-per-unit rate to the new text,
    scaled by 1/speed. SINGLE SOURCE OF TRUTH — the serving engine's bucket
    estimate (``Synthesizer.estimate_bucket``) and the synthesis paths
    (``synthesize_chunks``/``synthesize_requests``) all call this; if the
    formulas drifted, the engine would group requests into buckets their real
    shape then misses (silent recompiles + padding waste)."""
    return ref_frames + int(
        ref_frames / max(1, n_ref_units) * n_gen_units / max(speed, 1e-6)
    )


def cross_fade_concat(
    waves: Sequence[np.ndarray], sample_rate: int, cross_fade_duration: float
) -> np.ndarray:
    """Linear cross-fade stitching (reference ``utils_infer.py:586-617``)."""
    if not waves:
        return np.zeros(0, dtype=np.float32)
    if cross_fade_duration <= 0:
        return np.concatenate(list(waves))
    final = waves[0]
    for nxt in waves[1:]:
        n = int(cross_fade_duration * sample_rate)
        n = min(n, len(final), len(nxt))
        if n <= 0:
            final = np.concatenate([final, nxt])
            continue
        fade_out = np.linspace(1.0, 0.0, n)
        fade_in = np.linspace(0.0, 1.0, n)
        overlap = final[-n:] * fade_out + nxt[:n] * fade_in
        final = np.concatenate([final[:-n], overlap, nxt[n:]])
    return final


def clip_and_shuffle(
    mel: np.ndarray, ratio: Optional[float], frames_per_second: int, rng: np.random.Generator
) -> np.ndarray:
    """Accent-GRL conditioning shuffle (reference ``cfm.py:39-83``): crop a
    segment, shuffle ~1 s chunks, repeat to original length. mel: [T, D]."""
    total = mel.shape[0]
    if total <= 1:  # nothing to shuffle (degenerate short reference)
        return mel
    seg_len = (
        int(total * ratio)
        if ratio
        else int(rng.integers(int(0.25 * total), max(int(0.25 * total) + 1, int(0.75 * total) + 1)))
    )
    seg_len = max(1, seg_len)
    start = int(rng.integers(0, max(1, total - seg_len + 1)))
    seg = mel[start : start + seg_len]
    n_chunks = -(-seg.shape[0] // frames_per_second)
    chunks = [seg[i * frames_per_second : (i + 1) * frames_per_second] for i in range(n_chunks)]
    order = rng.permutation(len(chunks))
    shuffled = np.concatenate([chunks[i] for i in order], axis=0) if chunks else seg
    while shuffled.shape[0] < total:
        shuffled = np.concatenate([shuffled, chunks[int(rng.integers(len(chunks)))]], axis=0)
    return shuffled[:total]


class Synthesizer:
    """Owns model defs + params and a cache of jitted programs.

    The reference rebuilds its model per Gradio request (SURVEY.md §3.4 notes
    this as an anti-pattern); here one Synthesizer is long-lived and programs
    are cached per (settings, shape-bucket).
    """

    def __init__(
        self,
        dit_model: Any,
        dit_params: Any,
        vocoder_model: Optional[Vocos],
        vocoder_params: Any,
        vocab: Vocab,
        mel_cfg: MelSpecConfig = MelSpecConfig(),
        max_duration: int = 4096,
        prosody_encoder: Any = None,
        prosody_to_mel: Any = None,
        mesh: Any = None,
    ):
        self.prosody_encoder = prosody_encoder
        self.prosody_to_mel = prosody_to_mel
        # multi-chip serving: shard batches over the mesh 'data' axis and
        # replicate params (SURVEY §2.3 — batch is the scaling axis)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            dit_params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), dit_params
            )
            if vocoder_params is not None:
                vocoder_params = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, rep), vocoder_params
                )
            self._batch_multiple = mesh.shape["data"]
            # mesh spans processes (multi-host serving, serve/multihost.py):
            # results land sharded across hosts, so fetches must allgather
            self._multiproc = any(
                d.process_index != jax.process_index()
                for d in mesh.devices.flat
            )
        else:
            self._batch_multiple = 1
            self._multiproc = False
        self.dit_model = dit_model
        self.dit_params = dit_params
        self.vocoder_model = vocoder_model
        self.vocoder_params = vocoder_params
        self.vocab = vocab
        self.mel_cfg = mel_cfg
        self.max_duration = max_duration
        self.mel_frontend = MelFrontend(
            n_fft=mel_cfg.n_fft,
            hop_length=mel_cfg.hop_length,
            win_length=mel_cfg.win_length,
            n_mel_channels=mel_cfg.n_mel_channels,
            target_sample_rate=mel_cfg.target_sample_rate,
            mel_spec_type=mel_cfg.mel_spec_type,
        )
        self._samplers: Dict[SamplerSettings, Any] = {}
        self._sampler_lock = threading.Lock()
        self._warned_cache_drop = False
        self.vocoder_kind = type(vocoder_model).__name__.lower() if vocoder_model else ""
        self._decode = (
            None
            if vocoder_model is None
            else jax.jit(
                partial(vocoder_model.apply, method=type(vocoder_model).decode)
            )
        )

    # ---------------------------------------------------------------- sampler
    def _sampler(self, settings: SamplerSettings):
        # Thread-safe program cache: the Synthesizer is shared by serving
        # threads (the reference's analogous path — a mutable text cache under
        # a ThreadPool — was an actual data race, SURVEY.md §5; here the only
        # shared mutable state is this cache, and it's locked).
        fn = self._samplers.get(settings)
        if fn is None:
            with self._sampler_lock:
                fn = self._samplers.get(settings)
                if fn is None:
                    if (self.mesh is not None
                            and dict(self.mesh.shape).get("seq", 1) > 1):
                        fn = self._seq_sampler(settings)
                    else:
                        fn = make_sampler(self.dit_model, settings)
                        if self.mesh is not None:
                            from lemas_tts_tpu.parallel.mesh import (
                                data_parallel_sampler,
                            )

                            fn = data_parallel_sampler(fn, self.mesh)
                    self._samplers[settings] = fn
        return fn

    def _block_cache_kwargs(self, cfg: SamplerConfig) -> dict:
        """Gated block-cache ``SamplerSettings`` kwargs for THIS synthesizer.
        On top of :func:`block_cache_fields`' depth/method clamps, the cache
        is DiT-only (needs ``arch``/``embed_inputs``/``head``) — other
        backbones fall back to the exact path instead of turning the serving
        default into a trace-time error. (Sequence-parallel meshes compose
        since the schedule became statically segmented — no collectives
        under ``lax.cond``; pinned by ``tests/test_sequence_parallel.py``.)
        A user-set spec that the gates drop logs a one-time warning so the
        speed knob never silently does nothing."""
        depth = getattr(getattr(self.dit_model, "arch", None), "depth", None)
        if depth is None or not hasattr(type(self.dit_model), "embed_inputs"):
            fields = {}
        else:
            fields = block_cache_fields(cfg.block_cache, depth, cfg.ode_method)
        if cfg.block_cache and parse_block_cache(cfg.block_cache) and \
                not fields and not self._warned_cache_drop:
            self._warned_cache_drop = True
            logger.warning(
                "block_cache=%r disabled: %s — sampling on the exact path",
                cfg.block_cache,
                "DiT-only feature" if depth is None
                or not hasattr(type(self.dit_model), "embed_inputs")
                else f"ode_method={cfg.ode_method!r} or range empty at "
                     f"depth {depth}",
            )
        return fields

    def _seq_sampler(self, settings: SamplerSettings):
        """Sequence-parallel sampling on a ('data','seq') mesh
        (parallel/sequence.py): the sequence axis of every utterance shards
        over 'seq' — ring attention + halo convs cut long-bucket latency
        with chip count. GRL step_cond shards over 'seq' like cond; prosody
        conditioning folds into the precomputed text embeds (both handled
        inside sequence_parallel_sampler)."""
        from lemas_tts_tpu.parallel.sequence import sequence_parallel_sampler

        if not hasattr(self.dit_model, "seq_axis"):
            raise NotImplementedError(
                f"sequence parallelism supports the DiT backbone only, "
                f"not {type(self.dit_model).__name__}"
            )
        return sequence_parallel_sampler(
            self.dit_model.clone(seq_axis="seq"), settings, self.mesh
        )

    def _pick_batch(self, b: int) -> int:
        bp = pick_bucket(b, BATCH_BUCKETS)
        m = self._batch_multiple
        return bp if bp % m == 0 else ((bp + m - 1) // m) * m

    def estimate_bucket(self, ref_wav, ref_sr: int, ref_units, gen_units,
                        cfg: SamplerConfig) -> int:
        """Duration bucket a request will land in — the serving engine
        groups requests by this so a batch compiles to one program shape.
        Shares :func:`estimate_duration_frames` with the synthesis paths."""
        sr = self.mel_cfg.target_sample_rate
        hop = self.mel_cfg.hop_length
        # shape[-1], not len(): stereo refs are [C, T] and len() would be C
        n_samples = int(np.asarray(ref_wav).shape[-1])
        ref_sr = max(1, int(ref_sr))
        # ceil-divide to match the polyphase resampler's output length
        # (ops/resample.py target_len = ceil(new/orig · T)), then // hop —
        # the same ref_audio_len synthesize_requests computes
        ref_len = (-(-n_samples * sr // ref_sr)) // hop if ref_sr != sr \
            else n_samples // hop
        dur = estimate_duration_frames(
            ref_len, len(ref_units), len(gen_units), cfg.speed
        )
        # mirror synthesize_requests' duration floor/cap exactly: the floor
        # (total token count / cond frames, +1 generated frame) can cross a
        # bucket boundary the raw estimate misses, and a mismatch would batch
        # this request with peers whose program shape it then can't share
        if isinstance(ref_units, str) and self.vocab.char_map is None:
            # byte-vocab path: text_to_ids yields one id per utf-8 byte
            n_units = len((ref_units + gen_units).encode("utf-8"))
        else:
            n_units = len(ref_units) + len(gen_units)
        # cond-mel frame count: center=True STFT (vocos) yields T//hop + 1
        # frames, the bigvgan variant T//hop
        cond_frames = ref_len + 1 \
            if self.mel_cfg.mel_spec_type == "vocos" else ref_len
        dur = max(max(n_units, cond_frames) + 1, dur)
        dur = min(dur, cfg.max_duration, DURATION_BUCKETS[-1])
        return pick_bucket(dur, DURATION_BUCKETS)

    def warmup(
        self,
        cfg: SamplerConfig = SamplerConfig(),
        duration_buckets: Sequence[int] = (1024,),
        text_buckets: Sequence[int] = (256,),
        batch_buckets: Sequence[int] = (1,),
    ) -> int:
        """Precompile sampler+vocoder programs for the given shape buckets so
        the first real request pays no compile latency (serving startup hook;
        first XLA compiles run tens of seconds on TPU). Returns the number of
        programs compiled.

        Caveat: jit caches key on argument sharding/commitment, and this
        warms with synthetic (uncommitted) arrays — through a remote-device
        link the first real dispatch can still pay a re-trace even though
        the XLA executable itself is reused. A deployment that needs a hard
        zero-tail first request should warm through
        :meth:`synthesize_requests` with representative requests instead
        (``scripts/latency_probe.py --loaded_ttfb`` does this)."""
        D = self.mel_cfg.n_mel_channels
        # NOTE: the ref-mel/resample programs compile per *ref sample count*
        # (exact-length STFT keeps mel parity with the reference's reflect
        # padding), so they cannot be usefully precompiled here; a deployment
        # that needs zero cold-start should pin its reference audio to fixed
        # lengths at the preprocessing boundary.
        settings = SamplerSettings(
            steps=cfg.nfe_steps,
            cfg_strength=cfg.cfg_strength,
            sway_sampling_coef=cfg.sway_sampling_coef,
            method=cfg.ode_method,
            cfg_cutoff=cfg.cfg_cutoff,
            **self._block_cache_kwargs(cfg),
        )
        run = self._sampler(settings)
        n = 0
        for B in batch_buckets:
            B = self._pick_batch(B)
            # dispatch-path helper programs compile per batch size too —
            # seeded-noise batch (incl. the int64-seed convert) and the
            # vocoder slice. Missing them costs seconds per first dispatch
            # at a new size through a remote-device link, which is exactly
            # the tail a warmed deployment is trying to avoid.
            for N in duration_buckets:
                D_ = self.mel_cfg.n_mel_channels
                jax.block_until_ready(
                    _batched_y0(jnp.asarray(np.zeros(B, np.int64)), N, D_))
                # jnp.asarray over a python int list (starts/lens staging)
                # compiles a weak→strong convert_element_type once per size
                jax.block_until_ready(jnp.asarray([0] * B, jnp.int32))
                for dn in [b for b in DURATION_BUCKETS if b <= N]:
                    jax.block_until_ready(_slice_for_vocoder(
                        jnp.zeros((B, N, D_)),
                        jnp.zeros(B, jnp.int32),
                        jnp.ones(B, jnp.int32), dn))
            for N in duration_buckets:
                for nt in text_buckets:
                    out = run(
                        self.dit_params,
                        jnp.zeros((B, N, D)),
                        jnp.zeros((B, N), bool).at[:, :8].set(True),
                        jnp.full((B, nt), -1, jnp.int32),
                        jnp.full((B,), N, jnp.int32),
                        jnp.zeros((B, N, D)),
                        None,
                    )
                    jax.block_until_ready(out)
                    if self._decode is not None:
                        # real requests vocode at pick_bucket(duration −
                        # ref_len), which is usually SMALLER than the sampler
                        # bucket — precompile every decode bucket up to N
                        for dn in [b for b in DURATION_BUCKETS if b <= N]:
                            jax.block_until_ready(
                                self._decode(
                                    self.vocoder_params,
                                    jnp.zeros((B, D, dn)),
                                    jnp.zeros((B, dn), bool).at[:, :8].set(True),
                                )
                            )
                    n += 1
        return n

    # ------------------------------------------------------------- mel utils
    def ref_mel(self, wav_24k: np.ndarray) -> np.ndarray:
        """[T] float wave @ target sr → [frames, n_mels] log-mel."""
        mel = self.mel_frontend(jnp.asarray(wav_24k)[None, :])  # [1, D, T]
        return np.asarray(mel)[0].T  # [T, D]

    # ------------------------------------------------------------ main entry
    def synthesize_chunks(
        self,
        ref_wav: np.ndarray,  # [T] float mono
        ref_sr: int,
        ref_text_units: Sequence[str] | str,  # phone tokens or raw string
        gen_chunks: Sequence[Sequence[str] | str],
        cfg: SamplerConfig = SamplerConfig(),
        seed: Optional[int] = None,
        return_parts: bool = False,
        noise_override: Optional[np.ndarray] = None,
        duration_override: Optional[Sequence[int]] = None,
    ) -> Tuple[np.ndarray, int, np.ndarray]:
        """Zero-shot TTS over pre-tokenized chunks.

        Mirrors ``infer_batch_process`` (``utils_infer.py:464-625``): RMS
        normalization, resample to the model rate, per-chunk duration estimate,
        sampling, vocoding, RMS restore, cross-fade stitch. Returns
        (wave, sample_rate, concatenated mel [n_mels, T]).

        ``noise_override`` ([T, n_mels], zero-padded/truncated to the duration
        bucket) replaces the seeded initial-noise draw, and
        ``duration_override`` (per-chunk frame counts, still subject to the
        reference's min/max clamps) replaces the duration estimate. Both exist
        for the checkpoint parity harness (``scripts/parity_check.py``), which
        must pin the sampler inputs to the ones a captured reference run used.
        """
        # more chunks than the largest batch bucket → process in groups
        # (batch-invariant per-chunk noise keeps results identical)
        max_b = BATCH_BUCKETS[-1]
        if len(gen_chunks) > max_b:
            waves: List[np.ndarray] = []
            slices: List[np.ndarray] = []
            for i in range(0, len(gen_chunks), max_b):
                w, sr_out, s = self.synthesize_chunks(
                    ref_wav, ref_sr, ref_text_units,
                    list(gen_chunks[i : i + max_b]), cfg, seed,
                    return_parts=True,
                    noise_override=noise_override,
                    duration_override=None if duration_override is None
                    else list(duration_override[i : i + max_b]),
                )
                waves += w
                slices += s
            if return_parts:
                return waves, sr_out, slices
            final = cross_fade_concat(waves, sr_out, cfg.cross_fade_duration)
            final = np.clip(final, -0.999, 0.999)
            return final, sr_out, np.concatenate([g.T for g in slices], axis=1)

        if not gen_chunks:  # nothing to synthesize (e.g. whitespace-only text)
            sr = self.mel_cfg.target_sample_rate
            empty_mel = np.zeros((self.mel_cfg.n_mel_channels, 0), np.float32)
            if return_parts:
                return [], sr, []
            return np.zeros(0, np.float32), sr, empty_mel

        pending = self._dispatch_chunks(
            ref_wav, ref_sr, ref_text_units, gen_chunks, cfg=cfg, seed=seed,
            noise_override=noise_override,
            duration_override=duration_override,
        )
        return self._finalize_chunks(pending, cfg, return_parts=return_parts)

    def _prepare_ref(self, ref_wav: np.ndarray, ref_sr: int,
                     cfg: SamplerConfig) -> dict:
        """Reference-audio prep shared by every mini-batch of one request:
        RMS normalize, resample to the model rate, reference mel, optional
        prosody embedding (the only per-dispatch steps that BLOCK on a device
        fetch). Computed once per stream/batch so dispatches stay async."""
        sr = self.mel_cfg.target_sample_rate
        hop = self.mel_cfg.hop_length
        audio = np.asarray(ref_wav, dtype=np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=0)
        rms = float(np.sqrt(np.mean(np.square(audio)))) if audio.size else 0.0
        if rms < cfg.target_rms and rms > 0:
            audio = audio * (cfg.target_rms / rms)
        if ref_sr != sr:
            audio = np.asarray(resample(jnp.asarray(audio), ref_sr, sr))
        ref_audio_len = audio.shape[-1] // hop  # reference utils_infer.py:520
        cond_mel = self.ref_mel(audio)  # [ref_frames, D] (= ref_audio_len + 1)
        prosody_emb = None
        if (
            cfg.use_prosody_encoder
            and self.prosody_encoder is not None
            and self.prosody_to_mel is not None
        ):
            wav16 = np.asarray(resample(jnp.asarray(audio), sr, 16000))
            prosody_emb = np.asarray(self.prosody_encoder.embed(wav16))  # [512]
        return dict(audio=audio, rms=rms, ref_audio_len=ref_audio_len,
                    cond_mel=cond_mel, prosody_emb=prosody_emb)

    def _dispatch_chunks(
        self,
        ref_wav: np.ndarray,
        ref_sr: int,
        ref_text_units: Sequence[str] | str,
        gen_chunks: Sequence[Sequence[str] | str],
        cfg: SamplerConfig = SamplerConfig(),
        seed: Optional[int] = None,
        noise_override: Optional[np.ndarray] = None,
        duration_override: Optional[Sequence[int]] = None,
        ref_prep: Optional[dict] = None,
    ) -> dict:
        """Device-dispatch half of :meth:`synthesize_chunks` (≤ max batch
        bucket, ≥1 chunk): all host prep + the sampler and vocoder calls
        ENQUEUED (JAX async dispatch), no blocking fetch. Returns a pending
        dict for :meth:`_finalize_chunks`. Split out so
        :meth:`synthesize_stream` can double-buffer — dispatch mini-batch
        i+1 while batch i's fetch/yield drains — and so the streaming and
        batched paths can never drift (batched = dispatch → finalize).
        ``ref_prep`` (from :meth:`_prepare_ref`) supplies the reference-audio
        prep precomputed — the stream path passes it so no per-batch device
        fetch (ref mel, prosody embed) stalls behind the previous batch in
        the device queue."""
        sr = self.mel_cfg.target_sample_rate
        hop = self.mel_cfg.hop_length

        if ref_prep is None:
            ref_prep = self._prepare_ref(ref_wav, ref_sr, cfg)
        rms = ref_prep["rms"]
        ref_audio_len = ref_prep["ref_audio_len"]
        cond_mel = ref_prep["cond_mel"]
        ref_frames = cond_mel.shape[0]

        # --- durations & texts per chunk (utils_infer.py:506-527)
        if duration_override is not None and len(duration_override) != len(gen_chunks):
            raise ValueError(
                f"duration_override has {len(duration_override)} entries for "
                f"{len(gen_chunks)} chunks"
            )
        texts: List[np.ndarray] = []
        durations: List[int] = []
        for chunk_idx, gen in enumerate(gen_chunks):
            if isinstance(ref_text_units, str) != isinstance(gen, str):
                raise TypeError(
                    "ref_text_units and gen chunks must both be strings or "
                    f"both token lists (got {type(ref_text_units).__name__} "
                    f"/ {type(gen).__name__})"
                )
            local_speed = cfg.speed
            if isinstance(gen, str) and isinstance(ref_text_units, str):
                if len(gen.encode("utf-8")) < 10:
                    local_speed = 0.3
            if duration_override is not None:
                duration = int(duration_override[chunk_idx])
            elif cfg.fix_duration is not None:
                duration = int(cfg.fix_duration * sr / hop)
            else:
                duration = estimate_duration_frames(
                    ref_audio_len, len(ref_text_units), len(gen), local_speed
                )
            full = ref_text_units + gen if isinstance(gen, str) \
                else list(ref_text_units) + list(gen)
            ids = text_to_ids(full, self.vocab)
            # duration ≥ max(text_len, ref_frames) + 1, ≤ max cap (cfm.py:300-304)
            duration = max(max(len(ids), ref_frames) + 1, duration)
            duration = min(duration, cfg.max_duration, DURATION_BUCKETS[-1])
            texts.append(ids)
            durations.append(duration)

        B = len(texts)
        Bp = self._pick_batch(B)
        N = pick_bucket(max(durations), DURATION_BUCKETS)
        max_ids = max(len(t) for t in texts)
        if max_ids > TEXT_BUCKETS[-1]:
            raise ValueError(
                f"text length {max_ids} exceeds the largest text bucket "
                f"({TEXT_BUCKETS[-1]}); split the text into more chunks"
            )
        nt = pick_bucket(max_ids, TEXT_BUCKETS)

        text_ids = pad_text_batch(texts, pad_to=nt)
        if Bp > B:  # pad batch with dummy rows (discarded)
            text_ids = np.concatenate(
                [text_ids, np.full((Bp - B, nt), -1, dtype=np.int32)], axis=0
            )
        dur_arr = np.asarray(durations + [ref_frames + 1] * (Bp - B), dtype=np.int32)

        # ref audio longer than the largest bucket → truncate its mel (same
        # clamp as synthesize_requests / edit_speech)
        ref_frames = min(ref_frames, N)
        cond_mel = cond_mel[:ref_frames]
        cond = np.zeros((Bp, N, self.mel_cfg.n_mel_channels), dtype=np.float32)
        cond[:, :ref_frames] = cond_mel[None]
        cond_mask = np.zeros((Bp, N), dtype=bool)
        cond_mask[:, :ref_frames] = True

        cond_mean = cond_mel.mean(axis=0, keepdims=True)  # [1, D] (cfm.py:239)
        rng = np.random.default_rng(seed if seed is not None else None)

        # --- optional global prosody conditioning (cfm.py:245-265,451-455):
        # one embedding from the 16 kHz ref audio (_prepare_ref); mel-side
        # injection over the ref frames (before masking, so the final paste
        # keeps it) and text-side broadcast through both CFG passes.
        prosody_text = None
        emb = ref_prep.get("prosody_emb")
        if emb is not None:
            w, b = (
                np.asarray(self.prosody_to_mel["kernel"]),
                np.asarray(self.prosody_to_mel["bias"]),
            )
            cond[:, :ref_frames] += (emb @ w + b)[None, None, :]
            prosody_text = np.broadcast_to(
                emb[None, None, :], (Bp, nt, emb.shape[-1])
            ).astype(np.float32)

        step_cond = None
        if cfg.use_acc_grl and cfg.ref_ratio is not None and cfg.ref_ratio < 1:
            shuffled = clip_and_shuffle(
                cond_mel, cfg.ref_ratio, int(sr / hop), rng
            )  # [ref_frames, D]
            step_cond = cond.copy()
            step_cond[:, :ref_frames] = shuffled[None]

        if cfg.no_ref_audio:  # cfm.py:320-324
            random_cond = rng.standard_normal(cond.shape).astype(np.float32) * 0.1 + cond_mean
            random_cond = random_cond / random_cond.mean(axis=1, keepdims=True) * cond_mean
            cond = random_cond

        # --- shared seeded noise prefix (cfm.py:430-435 semantics)
        if noise_override is not None:
            pad = np.zeros((N, self.mel_cfg.n_mel_channels), np.float32)
            t = min(len(noise_override), N)
            pad[:t] = np.asarray(noise_override[:t], np.float32)
            noise = jnp.asarray(pad)
        else:
            noise_seed = seed if seed is not None else int(rng.integers(2**31 - 1))
            noise = jax.random.normal(
                jax.random.key(noise_seed), (N, self.mel_cfg.n_mel_channels),
                jnp.float32,
            )
        y0 = jnp.broadcast_to(noise[None], (Bp, N, self.mel_cfg.n_mel_channels))

        t_start = 0.0
        if cfg.duplicate_test:
            # duplicate-test diagnostic (cfm.py:307-309,439-443): start the
            # flow at t_inter from a state blended with the ref mel duplicated
            # right after the prompt region.
            t_start = cfg.t_inter
            test_cond = np.zeros_like(cond)
            dup_end = min(2 * ref_frames, N)
            test_cond[:, ref_frames:dup_end] = cond_mel[None, : dup_end - ref_frames]
            y0 = (1.0 - t_start) * y0 + t_start * jnp.asarray(test_cond)

        settings = SamplerSettings(
            steps=int(cfg.nfe_steps * (1.0 - t_start)) or 1,
            cfg_strength=cfg.cfg_strength,
            sway_sampling_coef=cfg.sway_sampling_coef,
            method=cfg.ode_method,
            cfg_cutoff=cfg.cfg_cutoff,
            t_start=t_start,
            **self._block_cache_kwargs(cfg),
        )
        run = self._sampler(settings)
        out = run(
            self.dit_params,
            jnp.asarray(cond),
            jnp.asarray(cond_mask),
            jnp.asarray(text_ids),
            jnp.asarray(dur_arr),
            y0,
            None if step_cond is None else jnp.asarray(step_cond),
            None if prosody_text is None else jnp.asarray(prosody_text),
        )
        pending = dict(B=B, sr=sr, rms=rms, durations=durations,
                       ref_frames=ref_frames, ref_audio_len=ref_audio_len)
        if cfg.no_ref_audio:
            # mean re-alignment (cfm.py:464-467) needs host-side mutation of
            # the mel — the fetch/vocode both happen at finalize time
            pending.update(kind="no_ref", out=out, cond_mean=cond_mean)
        else:
            # mel stays device-resident through slicing and vocoding (see
            # synthesize_requests — same two-transfer saving per call);
            # degenerate truncation guard keeps ≥1 generated frame
            starts_l = [min(ref_audio_len, durations[i] - 1) for i in range(B)]
            lens_l = [durations[i] - starts_l[i] for i in range(B)]
            Bp_rows = out.shape[0]
            n_out = pick_bucket(max(lens_l), DURATION_BUCKETS)
            starts_j = jnp.asarray(starts_l + [0] * (Bp_rows - B), jnp.int32)
            lens_j = jnp.asarray(lens_l + [1] * (Bp_rows - B), jnp.int32)
            sliced, vmask = _slice_for_vocoder(out, starts_j, lens_j, n_out)
            if self._decode is None:
                raise RuntimeError("no vocoder configured")
            pending.update(
                kind="decode", lens_l=lens_l, sliced=sliced,
                waves_dev=self._decode(self.vocoder_params, sliced, vmask))
        return pending

    def _finalize_chunks(self, pending: dict, cfg: SamplerConfig,
                         return_parts: bool = False):
        """Blocking half of :meth:`synthesize_chunks`: fetch the dispatched
        device results, trim/RMS-restore/clip, stitch (or return parts)."""
        B, sr, rms = pending["B"], pending["sr"], pending["rms"]
        durations = pending["durations"]
        hop = self.mel_cfg.hop_length
        if pending["kind"] == "no_ref":
            # mean re-alignment of the generated region (cfm.py:464-467) —
            # niche path, host-side mutation then batched re-upload
            ref_frames = pending["ref_frames"]
            ref_audio_len = pending["ref_audio_len"]
            out_np = np.array(self._fetch(pending["out"]), dtype=np.float32)  # [Bp, N, D]
            gen_region = out_np[:, ref_frames:, :]
            out_np[:, ref_frames:, :] = gen_region - (
                gen_region.mean(axis=1, keepdims=True) - pending["cond_mean"][None]
            )
            gen_slices = [
                out_np[i, min(ref_audio_len, durations[i] - 1) : durations[i], :]
                for i in range(B)
            ]
            waves = self.vocode_batch(gen_slices)
        else:
            lens_l = pending["lens_l"]
            # one batched device_get: waves plus the returned mels (part of
            # the result contract) in a single host transfer (collective
            # allgather when the mesh spans processes — see _fetch; followers
            # join it via the broadcast stream-finalize op)
            waves_np, mels_np = self._fetch(
                (pending["waves_dev"], pending["sliced"]))
            if self.vocoder_kind == "bigvgan":
                up = self.vocoder_model.cfg.total_upsample
                trims = [ln * up for ln in lens_l]
            else:  # vocos iSTFT head: T frames → (T−1)×hop samples
                trims = [(ln - 1) * hop for ln in lens_l]
            gen_slices = [mels_np[i, :, : lens_l[i]].T for i in range(B)]
            waves = [waves_np[i, : trims[i]] for i in range(B)]
        if rms < cfg.target_rms and rms > 0:
            waves = [w * (rms / cfg.target_rms) for w in waves]

        if return_parts:  # streaming: per-chunk waves, no cross-fade
            return [np.clip(w, -0.999, 0.999) for w in waves], sr, gen_slices
        final = cross_fade_concat(waves, sr, cfg.cross_fade_duration)
        final = np.clip(final, -0.999, 0.999)
        mel_concat = np.concatenate([g.T for g in gen_slices], axis=1)  # [D, T]
        return final, sr, mel_concat

    # --------------------------------------------------------------- streaming
    def _stream_plan(self, n_chunks: int, cfg: SamplerConfig,
                     chunk_batch: int, first_chunk_batch: Optional[int],
                     first_chunk_cfg: Optional[SamplerConfig]):
        """Mini-batch plan ``[(start, size, cfg)]`` for a stream — the first
        batch may be smaller and/or run different sampler settings than the
        steady-state ones. Shared with the multihost broadcast stream
        (``serve/multihost.py``) so process 0 and its mirror loop can never
        drift on grouping (grouping changes the host-RNG noise draw)."""
        chunk_batch = max(1, chunk_batch)
        fb = chunk_batch if first_chunk_batch is None \
            else max(1, int(first_chunk_batch))
        plan = [(0, min(fb, n_chunks), first_chunk_cfg or cfg)]
        i = plan[0][1]
        while i < n_chunks:
            size = min(chunk_batch, n_chunks - i)
            plan.append((i, size, cfg))
            i += size
        return plan

    def synthesize_stream(
        self,
        ref_wav: np.ndarray,
        ref_sr: int,
        ref_text_units: Sequence[str] | str,
        gen_chunks: Sequence[Sequence[str] | str],
        cfg: SamplerConfig = SamplerConfig(),
        seed: Optional[int] = None,
        chunk_batch: int = 2,
        first_chunk_batch: Optional[int] = None,
        first_chunk_cfg: Optional[SamplerConfig] = None,
    ):
        """Streaming synthesis: yield ``(wave, sample_rate)`` per text chunk as
        soon as its mini-batch is done (reference streaming mode,
        ``utils_infer.py:559-570`` — chunks yielded in order, no cross-fade).

        Device utilization comes from ``chunk_batch`` chunks per sampler call;
        latency-to-first-audio from keeping that small. The loop is
        DOUBLE-BUFFERED: mini-batch i+1's sampler+vocoder programs are
        enqueued (JAX async dispatch) BEFORE batch i's results are fetched
        and yielded, so the device rolls straight from batch to batch while
        the host fetches/writes — steady-state throughput matches the
        batched path instead of serializing compute with host I/O. Reference
        prep (ref mel, prosody embed) is hoisted out of the loop
        (:meth:`_prepare_ref`); per-batch dispatch is fetch-free.

        TTFB controls (first-chunk prioritization, docs/serving.md):
        ``first_chunk_batch`` sizes ONLY the first mini-batch (default:
        ``chunk_batch``) — pass 1 so time-to-first-audio is one B=1 sampler
        call in chunk 0's own (small) duration bucket rather than a full
        mini-batch padded to the longest chunk; ``first_chunk_cfg``
        optionally overrides the sampler settings for that first batch only
        (e.g. a lower-NFE ramp), after which the stream continues at ``cfg``.
        Both leave later batches byte-identical to the plain stream with the
        same grouping."""
        if not gen_chunks:
            return
        ref_prep = self._prepare_ref(ref_wav, ref_sr, cfg)
        plan = self._stream_plan(len(gen_chunks), cfg, chunk_batch,
                                 first_chunk_batch, first_chunk_cfg)
        pending = None
        for start, size, bcfg in plan:
            batch = list(gen_chunks[start : start + size])
            nxt = (
                self._dispatch_chunks(
                    ref_wav, ref_sr, ref_text_units, batch, cfg=bcfg,
                    seed=seed, ref_prep=ref_prep,
                ),
                bcfg,
            )
            if pending is not None:
                waves, sr, _ = self._finalize_chunks(pending[0], pending[1],
                                                     return_parts=True)
                for w in waves:
                    yield w, sr
            pending = nxt
        waves, sr, _ = self._finalize_chunks(pending[0], pending[1],
                                             return_parts=True)
        for w in waves:
            yield w, sr

    # -------------------------------------------------- cross-request batching
    def synthesize_requests(
        self,
        requests: Sequence[Dict[str, Any]],
        cfg: SamplerConfig = SamplerConfig(),
    ) -> List[Tuple[np.ndarray, int, np.ndarray]]:
        """Serve MANY independent zero-shot requests as ONE sampler call.

        Each request dict: ``{"ref_wav": [T], "ref_sr": int, "ref_units":
        tokens|str, "gen_units": tokens|str, "seed": int|None}``. Unlike
        ``synthesize_chunks`` (one shared reference, chunks batched), every
        batch row here carries its own conditioning mel — the continuous-
        batching path used by the serving engine (cross-request batching has
        no reference equivalent; the reference serves one request at a time,
        SURVEY.md §3.4). Sampler settings are shared per batch; the engine
        groups requests accordingly. Returns [(wave, sr, mel [D, T])] in
        request order.
        """
        max_b = BATCH_BUCKETS[-1]
        if len(requests) > max_b:  # overflow → groups (results independent)
            out: List[Tuple[np.ndarray, int, np.ndarray]] = []
            for i in range(0, len(requests), max_b):
                out += self.synthesize_requests(requests[i : i + max_b], cfg)
            return out

        sr = self.mel_cfg.target_sample_rate
        hop = self.mel_cfg.hop_length
        D = self.mel_cfg.n_mel_channels

        rows = []
        for r in requests:
            audio = np.asarray(r["ref_wav"], dtype=np.float32)
            if audio.ndim == 2:
                audio = audio.mean(axis=0)
            rms = float(np.sqrt(np.mean(np.square(audio)))) if audio.size else 0.0
            if 0 < rms < cfg.target_rms:
                audio = audio * (cfg.target_rms / rms)
            if r["ref_sr"] != sr:
                audio = np.asarray(resample(jnp.asarray(audio), r["ref_sr"], sr))
            ref_audio_len = audio.shape[-1] // hop
            cond_mel = self.ref_mel(audio)
            ref_units, gen = r["ref_units"], r["gen_units"]
            if isinstance(ref_units, str) != isinstance(gen, str):
                raise TypeError(
                    "ref_units and gen_units must both be strings or both "
                    f"token lists (got {type(ref_units).__name__} / "
                    f"{type(gen).__name__})"
                )
            full = ref_units + gen if isinstance(gen, str) \
                else list(ref_units) + list(gen)
            ids = text_to_ids(full, self.vocab)
            duration = estimate_duration_frames(
                ref_audio_len, len(ref_units), len(gen), cfg.speed
            )
            duration = max(max(len(ids), cond_mel.shape[0]) + 1, duration)
            duration = min(duration, cfg.max_duration, DURATION_BUCKETS[-1])
            # ref longer than the duration cap → keep ≥1 generated frame
            # (same guard as synthesize_chunks; prevents a negative vocoder
            # slice returning a full bucket of garbage)
            ref_audio_len = min(ref_audio_len, duration - 1)
            rows.append(dict(ids=ids, duration=duration, cond_mel=cond_mel,
                             ref_audio_len=ref_audio_len, rms=rms,
                             seed=r.get("seed")))

        B = len(rows)
        Bp = self._pick_batch(B)
        N = pick_bucket(max(r["duration"] for r in rows), DURATION_BUCKETS)
        max_ids = max(len(r["ids"]) for r in rows)
        if max_ids > TEXT_BUCKETS[-1]:
            raise ValueError(
                f"text length {max_ids} exceeds the largest text bucket "
                f"({TEXT_BUCKETS[-1]}); split the request into chunks"
            )
        nt = pick_bucket(max_ids, TEXT_BUCKETS)

        text_ids = pad_text_batch([r["ids"] for r in rows], pad_to=nt)
        if Bp > B:
            text_ids = np.concatenate(
                [text_ids, np.full((Bp - B, nt), -1, dtype=np.int32)], axis=0
            )
        dur_arr = np.asarray(
            [r["duration"] for r in rows] + [2] * (Bp - B), dtype=np.int32
        )
        cond = np.zeros((Bp, N, D), dtype=np.float32)
        cond_mask = np.zeros((Bp, N), dtype=bool)
        entropy = np.random.default_rng()  # unseeded rows get fresh entropy,
        # independent of batch position (reference seeds per sample or draws
        # a random seed per call, cfm.py:430-435 / utils_infer.py)
        # int64: jax.random.key accepts the full int64 range (a user seed of
        # 2**33 or a negative seed must not crash the batch)
        seeds = np.zeros(Bp, dtype=np.int64)
        for i, r in enumerate(rows):
            f = min(r["cond_mel"].shape[0], N)
            cond[i, :f] = r["cond_mel"][:f]
            cond_mask[i, :f] = True
            seeds[i] = r["seed"] if r["seed"] is not None \
                else int(entropy.integers(2**31 - 1))
        # per-row seeded noise generated on device as one batch (bit-equal to
        # per-row jax.random.normal(key(seed)) — vmap semantics)
        y0 = _batched_y0(jnp.asarray(seeds), N, D)

        settings = SamplerSettings(
            steps=cfg.nfe_steps,
            cfg_strength=cfg.cfg_strength,
            sway_sampling_coef=cfg.sway_sampling_coef,
            method=cfg.ode_method,
            cfg_cutoff=cfg.cfg_cutoff,
            **self._block_cache_kwargs(cfg),
        )
        # mel stays device-resident through slicing and vocoding: through a
        # narrow host link (e.g. the benchmarking tunnel) the old
        # host-round-trip between sampler and vocoder dominated warm batch
        # latency, and on any host it is two avoidable transfers
        mel_dev = self._sampler(settings)(
            self.dit_params, jnp.asarray(cond), jnp.asarray(cond_mask),
            jnp.asarray(text_ids), jnp.asarray(dur_arr), y0, None,
        )

        if self._decode is None:
            raise RuntimeError("no vocoder configured")
        starts = jnp.asarray(
            [r["ref_audio_len"] for r in rows] + [0] * (Bp - B), jnp.int32)
        lens_list = [r["duration"] - r["ref_audio_len"] for r in rows]
        n_out = pick_bucket(max(lens_list), DURATION_BUCKETS)
        lens_arr = jnp.asarray(lens_list + [1] * (Bp - B), jnp.int32)
        sliced, vmask = _slice_for_vocoder(mel_dev, starts, lens_arr, n_out)
        # one batched device_get: waves plus the returned mels (part of the
        # result contract) in a single host transfer
        waves, mels_np = self._fetch(
            (self._decode(self.vocoder_params, sliced, vmask), sliced))

        if self.vocoder_kind == "bigvgan":
            up = self.vocoder_model.cfg.total_upsample
            trims = [ln * up for ln in lens_list]
        else:  # vocos iSTFT head: T frames → (T−1)×hop samples
            trims = [(ln - 1) * hop for ln in lens_list]
        results = []
        for i, r in enumerate(rows):
            w = waves[i, : trims[i]]
            if 0 < r["rms"] < cfg.target_rms:
                w = w * (r["rms"] / cfg.target_rms)
            results.append(
                (np.clip(w, -0.999, 0.999), sr,
                 mels_np[i, :, : lens_list[i]])
            )
        return results

    def _fetch(self, tree):
        """Host transfer for dispatch results. Single-process: one batched
        ``device_get``. Mesh spanning processes (``serve/multihost.py``):
        the arrays are global and this process addresses only its shards, so
        reshard-to-replicated + gather (``process_allgather`` — a collective
        every process joins, which follower_serve's lockstep guarantees)."""
        if self._multiproc:
            from jax.experimental import multihost_utils

            # tiled=True is REQUIRED for global arrays; the result is the
            # full (replicated) value as numpy on every process
            return multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    # ------------------------------------------------------------- vocoding
    def vocode_batch(self, mels: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Decode variable-length [T_i, D] mels as one masked batch call."""
        if self._decode is None:
            raise RuntimeError("no vocoder configured")
        max_b = BATCH_BUCKETS[-1]
        if len(mels) > max_b:  # overflow → groups
            out: List[np.ndarray] = []
            for i in range(0, len(mels), max_b):
                out += self.vocode_batch(mels[i : i + max_b])
            return out
        hop = self.mel_cfg.hop_length
        lens = [m.shape[0] for m in mels]
        N = pick_bucket(max(lens), DURATION_BUCKETS)
        B = self._pick_batch(len(mels))
        batch = np.zeros((B, self.mel_cfg.n_mel_channels, N), dtype=np.float32)
        mask = np.zeros((B, N), dtype=bool)
        for i, m in enumerate(mels):
            batch[i, :, : m.shape[0]] = m.T
            mask[i, : m.shape[0]] = True
        waves = np.asarray(
            self._fetch(self._decode(
                self.vocoder_params, jnp.asarray(batch), jnp.asarray(mask)))
        )
        if self.vocoder_kind == "bigvgan":  # pure conv stack: T frames → T×up
            up = self.vocoder_model.cfg.total_upsample
            return [waves[i, : lens[i] * up] for i in range(len(mels))]
        # vocos iSTFT head: T frames → (T−1)×hop samples
        return [waves[i, : (lens[i] - 1) * hop] for i in range(len(mels))]
