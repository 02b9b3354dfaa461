"""Property-based tests (hypothesis) for host-side numerics/utilities."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import jax.numpy as jnp

from lemas_tts_tpu.infer.editing import build_edit_mask
from lemas_tts_tpu.infer.pipeline import chunk_text, cross_fade_concat
from lemas_tts_tpu.ops.resample import resample
from lemas_tts_tpu.ops.stft import hann_window, istft, stft
from lemas_tts_tpu.utils.vocab import PAD_ID, Vocab, pad_text_batch, text_to_ids

SETTINGS = dict(max_examples=25, deadline=None)


@settings(**SETTINGS)
@given(st.text(min_size=0, max_size=300), st.integers(10, 120))
def test_chunk_text_preserves_content(text, budget):
    chunks = chunk_text(text, max_chars=budget)
    # non-whitespace content preserved in order
    squash = lambda s: "".join(s.split())
    assert squash("".join(chunks)) == squash(text)
    # every multi-sentence chunk respects the byte budget; single sentences
    # may exceed it (reference semantics: no mid-sentence splits)
    for c in chunks:
        if len(c.encode("utf-8")) > budget:
            import re

            parts = [p for p in re.split(r"(?<=[;:,.!?])\s+|(?<=[；：，。！？])", c) if p]
            assert len(parts) <= 1 or sum(
                len(p.encode("utf-8")) for p in parts[:-1]
            ) <= budget


@settings(**SETTINGS)
@given(st.integers(400, 3000), st.sampled_from([(256, 64), (512, 128)]))
def test_stft_istft_roundtrip_any_length(n, fft_hop):
    n_fft, hop = fft_hop
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n).astype(np.float32) * 0.5
    spec = stft(jnp.asarray(x), n_fft, hop, window=hann_window(n_fft))
    y = np.asarray(istft(spec, n_fft, hop, window=hann_window(n_fft), length=n))
    assert y.shape == (n,)
    # interior matches (edges lose energy to the analysis window)
    if n > 2 * n_fft:
        np.testing.assert_allclose(y[n_fft:-n_fft], x[n_fft:-n_fft], atol=1e-4)


@settings(**SETTINGS)
@given(st.integers(100, 5000),
       st.sampled_from([(16000, 24000), (24000, 16000), (44100, 24000),
                        (8000, 22050)]))
def test_resample_length_formula(n, freqs):
    import math

    orig, new = freqs
    x = np.zeros(n, np.float32)
    out = np.asarray(resample(jnp.asarray(x), orig, new))
    g = math.gcd(orig, new)
    expect = math.ceil((new // g) * n / (orig // g))
    assert out.shape[-1] == expect


@settings(**SETTINGS)
@given(st.lists(st.integers(1, 50), min_size=1, max_size=6))
def test_pad_text_batch_invariants(lengths):
    seqs = [np.arange(n, dtype=np.int32) for n in lengths]
    batch = pad_text_batch(seqs)
    assert batch.shape == (len(lengths), max(lengths))
    for i, n in enumerate(lengths):
        np.testing.assert_array_equal(batch[i, :n], seqs[i])
        assert (batch[i, n:] == PAD_ID).all()


@settings(**SETTINGS)
@given(st.integers(1000, 30000),
       st.lists(st.tuples(st.floats(0.0, 1.2), st.floats(0.1, 1.0)),
                min_size=1, max_size=3))
def test_edit_mask_shape_and_bounds(n, raw_spans):
    sr, hop = 8000, 64
    # normalize to ordered, in-range, non-overlapping spans
    spans = []
    cursor = 0.0
    for start_frac, dur in sorted(raw_spans):
        s = max(cursor, start_frac * n / sr)
        e = min(s + dur, n / sr)
        if e > s:
            spans.append((s, e))
            cursor = e + 0.05
    if not spans:
        spans = [(0.0, min(0.1, n / sr))]
    mask = build_edit_mask(spans, n, sr, hop, margin=0.0)
    assert mask.shape == (n // hop + 1,)
    assert mask.dtype == bool


@settings(**SETTINGS)
@given(st.lists(st.integers(50, 400), min_size=1, max_size=5),
       st.floats(0.0, 0.2))
def test_cross_fade_length(lengths, fade_s):
    sr = 1000
    waves = [np.ones(n, np.float32) for n in lengths]
    out = cross_fade_concat(waves, sr, fade_s)
    n_fade = int(fade_s * sr)
    expected = lengths[0]
    for n in lengths[1:]:
        k = min(n_fade, expected, n)
        expected += n - k
    assert len(out) == expected
    assert np.isfinite(out).all()


@settings(**SETTINGS)
@given(st.text(alphabet="ab cd(en)#1_", min_size=0, max_size=40))
def test_text_to_ids_bounds(text):
    vocab = Vocab(char_map={c: i for i, c in enumerate(" abcd()en#1_")}, size=12)
    ids = text_to_ids(list(text), vocab)
    assert ids.dtype == np.int32
    assert ((ids >= 0) & (ids < vocab.size)).all()


# mixed-script alphabet: latin, digits, CJK, kana, hangul, cyrillic, arabic,
# emoji, full-width punctuation, combining marks, control-ish whitespace
_FUZZ_ALPHABET = (
    "abcXYZ 0123456789.,!?;:()[]#|_-'\"\n\t"
    "你好世界中文数字一二三两千〇"
    "こんにちはカタカナ한국어"
    "привет مرحبا ñüßéàç"
    "€%$¥°½㎡"
    "。！？，、；：「」『』（）"
    "😀🎵👍"
    "́​"
)


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet=_FUZZ_ALPHABET, min_size=0, max_size=120))
def test_frontend_fuzz_never_crashes(text):
    """Arbitrary mixed-script input must flow through the host text frontend
    (normalize → phonemize → pause tokens) without exceptions, returning a
    str whose '|'-separated tokens are well-formed (reference contract
    frontend.py:184-223)."""
    from lemas_tts_tpu.text.frontend import TextNorm

    tn = _fuzz_frontend()
    lang, norm = tn.text2norm(text)  # (lang, normalized), frontend.py:242-251
    assert isinstance(lang, str) and isinstance(norm, str)
    phn = tn.text2phn(text)
    assert isinstance(phn, str)
    for tok in (t for t in phn.split("|") if t):
        # pause tokens keep the #N grammar; no raw newlines/tabs leak through
        assert "\n" not in tok and "\t" not in tok
        if tok.startswith("#") and len(tok) == 2:
            assert tok[1].isdigit()


def _fuzz_frontend():
    from lemas_tts_tpu.text.frontend import TextNorm

    global _FUZZ_TN
    try:
        return _FUZZ_TN
    except NameError:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            _FUZZ_TN = TextNorm(dtype="phone", strict=False)
        return _FUZZ_TN
