"""Phone-string golden fixtures: the checkpoint text contract, pinned.

``tests/data/phone_goldens.json`` freezes the frontend output for a fixed
multilingual sentence set (captured by
``scripts/capture_phone_goldens.py``). The fixture records which backend
produced it:

- ``builtin-fallback`` — the espeak-less char/pinyin fallbacks (the live CI
  paths in this environment). The drift test then runs everywhere.
- ``espeak-ng …`` — the REAL checkpoint contract
  (reference ``infer/frontend.py:184-223`` + ``text_norm/tokenizer.py``),
  captured once in an espeak-enabled environment. The drift test then
  skips where espeak is absent, while format/coverage checks still run.

Always-on checks: the token FORMAT contract (``(lang)phone`` tags, ``_``
separators, ``#n`` pauses, punctuation) and — when the fixture carries a
vocab snapshot or ``LEMAS_VOCAB_FILE`` points at one — full vocab coverage
of every golden token.
"""

import json
import os
import re
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "data" / "phone_goldens.json"

KNOWN_LANGS = {"zh", "cmn", "en", "it", "es", "pt", "fr", "de", "ru", "id",
               "vi", "th", "ja", "ko", "ar"}
PUNCT = {"_", " ", ",", ".", "!", "?", ":", ";", "'", '"', "^", "-",
         "。", "，", "？", "！", "、", "：", "(", ")"}


@pytest.fixture(scope="module")
def fixture():
    with open(FIXTURE, "r", encoding="utf-8") as f:
        return json.load(f)


def _live_backend() -> str:
    from lemas_tts_tpu.scripts.capture_phone_goldens import backend_id

    return backend_id()


def _backend_class(backend: str) -> str:
    """Coarse backend family: all espeak versions count as one class (the
    drift test still runs across espeak upgrades); builtin tiers are exact."""
    return "espeak" if backend.startswith("espeak") else backend


def test_goldens_regenerate_exactly(fixture):
    """The live frontend must reproduce the fixture bit-for-bit (drift
    detection). Skips when the fixture was captured with a backend this
    environment doesn't have (espeak goldens in an espeak-less CI)."""
    live = _live_backend()
    cap = fixture["backend"]
    if _backend_class(cap) != _backend_class(live):
        pytest.skip(f"fixture captured with {cap!r}, live backend {live!r}")

    from lemas_tts_tpu.scripts.capture_phone_goldens import capture_cases

    regenerated = capture_cases()
    assert len(regenerated) == len(fixture["cases"])
    for got, want in zip(regenerated, fixture["cases"]):
        assert got["text"] == want["text"]
        assert got["phones"] == want["phones"], (
            f"phone-string drift for {want['lang']}: {want['text']!r}\n"
            f"  fixture: {want['phones']}\n  live:    {got['phones']}")
        assert got["tokens"] == want["tokens"]


def test_golden_token_format_contract(fixture):
    """Every golden token obeys the vocab token grammar regardless of which
    backend captured it: ``(lang)phone`` / bare punctuation / ``#n`` / ``_``
    (reference ``api.py:252-276`` consumption contract)."""
    tag_re = re.compile(r"^\(([a-z]{2,3})\)(.*)$", re.DOTALL)
    for case in fixture["cases"]:
        assert case["phones"], case
        for t in case["tokens"]:
            m = tag_re.match(t)
            if m:
                assert m.group(1) in KNOWN_LANGS, t
                assert m.group(2) != "", t  # bare tags never survive
            else:
                assert (t in PUNCT or re.fullmatch(r"#[1-4]", t)
                        or not t[0].isalpha()), (
                    f"bare non-punct token {t!r} in {case['lang']} case — "
                    "phones must carry a (lang) tag")


def test_builtin_ipa_tier(fixture):
    """The hermetic builtin-ipa tier (VERDICT r4 item 4): English goldens
    must be IPA phone streams approximating the espeak contract — lowercase
    IPA symbols with ``_`` word separators — not the char fallback's
    letter-per-token stream (``(en)T|h|e…``)."""
    if _backend_class(fixture["backend"]) == "espeak":
        pytest.skip("espeak fixture: the real contract supersedes the tier")
    if fixture["backend"] == "builtin-fallback":
        pytest.skip("pre-round-5 char-fallback fixture")
    ipa_chars = set("əɚɜːɪʊʌæɑɔðθʃʒŋɹɡ")
    en = [c for c in fixture["cases"] if c["lang"] == "en"]
    assert en
    for case in en:
        toks = case["phones"].split("|")
        assert "_" in toks, f"no word separators in {case['phones']}"
        # IPA, not letters: at least a third of the phone tokens carry a
        # non-ASCII IPA symbol, and no uppercase char tokens survive
        tagged = [t for t in toks if t not in ("_", " ") and
                  not t.startswith("#") and t not in PUNCT and
                  not t.startswith("(")]
        assert tagged and not any(t.isupper() for t in tagged), toks
        n_ipa = sum(1 for t in tagged if set(t) & ipa_chars)
        assert n_ipa >= len(tagged) / 3, (n_ipa, tagged)
    # round 5: the tier extends to the regular orthographies — their
    # goldens must be word-separated lowercase phone streams too (the char
    # fallback has no "_" separators and keeps uppercase); ru additionally
    # must carry NO Cyrillic (char fallback would be 100% out-of-vocab)
    for lang in ("es", "it", "id", "de", "pt", "ru"):
        for case in [c for c in fixture["cases"] if c["lang"] == lang]:
            toks = case["phones"].split("|")
            assert "_" in toks, (lang, case["phones"])
            assert not any(t.isupper() for t in toks if t.isalpha()), toks
            if lang == "ru":
                assert not any("а" <= ch <= "я" for t in toks for ch in t), \
                    toks


def test_golden_pause_markers_survive(fixture):
    """#n pause markers must come through the frontend as single tokens
    (they are vocab entries; char-splitting them breaks the contract)."""
    for case in fixture["cases"]:
        if "#" not in case["text"]:
            continue
        markers = re.findall(r"#[1-4]", case["text"])
        for mk in markers:
            assert mk in case["phones"].split("|"), (
                f"{mk} not a single token in: {case['phones']}")


def test_golden_vocab_coverage(fixture):
    """When a real vocab snapshot is available, every golden token must be
    in it (the 898-token checkpoint asset). Sources: the fixture itself
    (``--vocab_file`` at capture time) or ``LEMAS_VOCAB_FILE``."""
    vocab = fixture.get("vocab")
    env = os.environ.get("LEMAS_VOCAB_FILE", "")
    if vocab is None and env and os.path.isfile(env):
        with open(env, "r", encoding="utf-8") as f:
            vocab = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
    if vocab is None:
        pytest.skip("no vocab snapshot in fixture and LEMAS_VOCAB_FILE unset")
    if not fixture["backend"].startswith("espeak"):
        pytest.skip("vocab coverage is only meaningful for espeak goldens "
                    "(the vocab is built from espeak phones)")
    vs = set(vocab)
    missing = {t for case in fixture["cases"] for t in case["tokens"]
               if t not in vs}
    assert not missing, f"golden tokens missing from vocab: {sorted(missing)}"


def test_zh_goldens_use_single_lang_tags(fixture):
    """Chinese cases must emit (zh)-tagged units and map CJK punctuation to
    ASCII (reference frontend ``_PAUSE_SYMBOL`` mapping)."""
    zh = [c for c in fixture["cases"] if c["lang"] == "zh"]
    assert zh
    for case in zh:
        assert any(t.startswith("(zh)") for t in case["tokens"]), case["text"]
        for cjk in ("。", "，", "！", "？", "："):
            assert cjk not in case["phones"], (
                f"unmapped CJK punctuation {cjk} in {case['phones']}")


# the reference's supported-language claim (README.md:9-20)
README_LANGS = ("zh", "en", "es", "ru", "fr", "de", "it", "pt", "id", "vi")


@pytest.mark.parametrize("lang", README_LANGS)
def test_readme_language_golden_contract(fixture, lang):
    """Per-README-language golden coverage (all 10 languages the reference
    claims): ≥2 cases each (plain + digits/pauses/punctuation), every
    tagged token carries the right language tag, #n pause markers survive
    as single tokens, and digits either normalize away or tokenize as
    tagged units — never as bare untagged words."""
    tag_re = re.compile(r"^\(([a-z]{2,3})\)(.*)$", re.DOTALL)
    cases = [c for c in fixture["cases"] if c["lang"] == lang]
    assert len(cases) >= 2, f"need ≥2 golden cases for {lang!r}"
    assert any(re.search(r"\d", c["text"]) for c in cases), (
        f"{lang!r} needs a digits/TN case")
    assert any("#" in c["text"] for c in cases), (
        f"{lang!r} needs a pause-marker case")
    # zh may legitimately code-switch to en (the mixed golden); en may carry
    # zh-normalized fragments via detection; others must be single-language
    allowed = {lang, "en"} if lang == "zh" else {lang}
    for case in cases:
        tagged = [m for t in case["tokens"] if (m := tag_re.match(t))]
        assert tagged, f"no tagged units in {case['text']!r}"
        seen = {m.group(1) for m in tagged}
        assert seen <= allowed, (
            f"{lang} case tagged with {seen - allowed}: {case['phones']}")
        for mk in re.findall(r"#[1-4]", case["text"]):
            assert mk in case["phones"].split("|"), (
                f"{mk} lost in {lang} case: {case['phones']}")
