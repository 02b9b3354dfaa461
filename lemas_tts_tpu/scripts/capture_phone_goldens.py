"""Capture phone-string goldens that pin the checkpoint text contract.

The frontend's phone-string format (reference
``lemas_tts/infer/frontend.py:184-223`` + ``text_norm/tokenizer.py:116-130``)
feeds the fixed custom vocab shipped with checkpoints, so any drift in it
silently breaks released-checkpoint compatibility. This script freezes the
frontend's output for a fixed multilingual sentence set into a JSON fixture
(``tests/data/phone_goldens.json``) that ``tests/test_phone_goldens.py``
replays on every CI run.

Run it ONCE in an espeak-enabled environment to capture the *real* espeak
contract (the fixture records which backend produced it)::

    python -m lemas_tts_tpu.scripts.capture_phone_goldens \
        --out tests/data/phone_goldens.json

Without espeak it captures the built-in fallback frontends (char frontend +
algorithmic pinyin) — still valuable: those are the live CI paths, and the
fixture pins them against refactor drift. Re-capturing in an espeak env
*upgrades* the fixture in place; the tests then skip the espeak cases in
espeak-less environments while always checking the token-format contract
and re-running whatever backend is locally available.

``--vocab_file`` additionally snapshots the vocab (the 898-token checkpoint
asset) into the fixture so CI can assert every golden token is covered.
"""

from __future__ import annotations

import argparse
import json
import sys

# One sentence per supported language (api.py LANGS), plus mixed/edge cases.
# Chinese routes through NSW normalization + pinyin G2P; the others through
# espeak (or the char fallback). Numbers/pauses exercise TN and #n handling.
SENTENCES = [
    ("en", "The quick brown fox jumps over 12 lazy dogs."),
    ("en", "Hello there, #2 general Kenobi!"),
    ("zh", "今天天气真不错，我们去公园散步吧。"),
    ("zh", "他花了1024元买了3本书。"),
    ("zh", "小明说:Hello world,然后就走了。"),  # code-switch
    ("es", "El rápido zorro marrón salta sobre el perro perezoso."),
    ("pt", "A raposa marrom rápida pula sobre o cachorro preguiçoso."),
    ("fr", "Le renard brun rapide saute par-dessus le chien paresseux."),
    ("de", "Der schnelle braune Fuchs springt über den faulen Hund."),
    ("it", "La rapida volpe marrone salta sopra il cane pigro."),
    ("ru", "Быстрая коричневая лиса прыгает через ленивую собаку."),
    ("id", "Rubah coklat cepat melompat di atas anjing malas."),
    ("vi", "Con cáo nâu nhanh nhẹn nhảy qua con chó lười."),
    ("th", "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้ามสุนัขขี้เกียจ"),
    # second case per README language (reference README.md:9-20): digits +
    # #n pauses + punctuation, so every language pins TN routing and the
    # pause-token contract, not just plain letters
    ("en", "Chapter 7 begins on page 132, #1 not page 133."),
    ("zh", "会议在2025年3月15日举行, #2 请准时参加。"),
    ("es", "Tengo 25 gatos, #1 y 3 perros en casa."),
    ("pt", "Ele comprou 42 livros em 2024, #2 todos novos!"),
    ("fr", "Il a 7 pommes, #2 et 19 poires aussi?"),
    ("de", "Sie hat 88 Bücher und 5 Stifte, #1 alle neu."),
    ("it", "Ho 31 anni, #3 e 2 gatti neri."),
    ("ru", "У меня 14 книг и 6 ручек, #1 все новые."),
    ("id", "Saya punya 100 buku, #1 dan 7 pena biru."),
    ("vi", "Tôi có 9 quyển sách và 15 cây bút, #2 tất cả mới."),
]


def backend_id() -> str:
    """Identify the live phone backend (recorded in the fixture).

    ``builtin-ipa`` is the hermetic tier (round 5): English phonemizes
    through the vendored lexicon+LTS G2P (``text/en_ipa.py``) and
    es/it/id/de/pt/ru through the ordered-rule transducers
    (``text/latin_ipa.py``); fr/vi/th/ja/ko fall back to char tokens,
    Chinese is unaffected (algorithmic pinyin). Fixtures captured as
    ``builtin-fallback`` predate the builtin G2P (pure char fallback)."""
    from lemas_tts_tpu.text import tokenizer as tok

    if not tok.available():
        return "builtin-ipa"
    try:
        import phonemizer
        from phonemizer.backend import EspeakBackend

        return (f"espeak-ng {EspeakBackend.version()} "
                f"(phonemizer {phonemizer.__version__})")
    except Exception:
        return "espeak-ng (version unknown)"


def capture_cases() -> list:
    from lemas_tts_tpu.api import process_phone_list
    from lemas_tts_tpu.text import TextNorm

    tn = TextNorm(dtype="phone", strict=False)
    cases = []
    for lang, text in SENTENCES:
        phones = tn.text2phn(text, lang=lang)
        tokens = process_phone_list(phones.split("|"))
        cases.append({"lang": lang, "text": text,
                      "phones": phones, "tokens": tokens})
    return cases


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Capture phone-string goldens.")
    p.add_argument("--out", type=str, default="tests/data/phone_goldens.json")
    p.add_argument("--vocab_file", type=str, default="",
                   help="Snapshot this vocab (one token per line) into the "
                        "fixture for coverage assertions.")
    args = p.parse_args(argv)

    fixture = {"backend": backend_id(), "cases": capture_cases()}
    if args.vocab_file:
        with open(args.vocab_file, "r", encoding="utf-8") as f:
            fixture["vocab"] = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(fixture, f, ensure_ascii=False, indent=1)
    print(f"{len(fixture['cases'])} cases captured with "
          f"backend={fixture['backend']!r} -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
