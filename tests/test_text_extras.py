"""Auxiliary text normalizers: English cleaners, Indonesian cleaners, gp2py."""

from lemas_tts_tpu.text.en_tn import (
    collapse_whitespace,
    english_cleaners,
    expand_abbreviations,
    expand_numbers,
    transliterate,
)
from lemas_tts_tpu.text.gp2py import GP2PY
from lemas_tts_tpu.text.id_tn import (
    expand_slang,
    indonesian_cleaners,
    number_to_words_id,
    remove_emoji,
)


def test_english_cleaners_pipeline():
    out = english_cleaners("Dr. Smith paid $20 on the 3rd of May, 1997 café!")
    assert "doctor" in out
    assert "twenty dollars" in out
    assert "third" in out
    assert "cafe" in out  # transliterated
    assert "$" not in out and not any(c.isdigit() for c in out)


def test_expand_numbers_variants():
    assert "one hundred" in expand_numbers("100")
    assert expand_numbers("1st").startswith("first")
    assert "2nd" not in expand_numbers("the 2nd time")
    assert "1,000" not in expand_numbers("1,000 things")


def test_abbreviations_and_ws():
    assert expand_abbreviations("Mr. and Mrs.") == "mister and misess"
    assert collapse_whitespace("  a   b \n c ") == "a b c"
    assert transliterate("naïve œuvre") == "naive oeuvre"


def test_indonesian_cleaners():
    out = indonesian_cleaners("gw gak tau 😂 knp 25 org dtg")
    assert "saya" in out and "tidak" in out and "kenapa" in out
    assert "😂" not in out
    assert "dua puluh lima" in out


def test_id_numbers():
    assert number_to_words_id("11") == "sebelas"
    assert number_to_words_id("21") == "dua puluh satu"
    assert number_to_words_id("105") == "seratus lima"
    assert number_to_words_id("1500") == "seribu lima ratus"
    assert number_to_words_id("2000000") == "dua juta"
    assert "koma" in number_to_words_id("3.14")


def test_remove_emoji_and_slang():
    assert remove_emoji("halo 🙂🙂 dunia").split() == ["halo", "dunia"]
    assert expand_slang("yg bgt") == "yang banget"


def test_gp2py_mixed_text():
    g = GP2PY()
    py, disp = g.gp2py("你好 world 123")
    # without pypinyin the hanzi fall back to chars; either way latin is
    # uppercased and numbers were normalized by cn_tn
    assert "WORLD" in py and "WORLD" in disp
    assert "你" in disp
    assert "123" not in py  # read as Chinese numerals


def test_audio_codec_wrappers_gated():
    """AudioTokenizer/AudioSR (reference tokenizer.py:146-235, unused by the
    pipeline) exist for API parity and fail loudly without their optional
    deps (audiocraft / dac are not installed in CI)."""
    import pytest

    from lemas_tts_tpu.text.tokenizer import AudioSR, AudioTokenizer

    for cls, args in ((AudioTokenizer, ()), (AudioSR, ("missing.ckpt",))):
        try:
            cls(*args)
        except ImportError as e:
            assert "optional" in str(e)
        except Exception as e:  # dep present: constructor may fail elsewhere
            pytest.skip(f"optional dep installed, other error: {e}")


def test_review_fixes_text_frontend():
    """Regressions for the text-review findings."""
    import warnings

    from lemas_tts_tpu.text.cn_tn import NSWNormalizer, num_to_chinese
    from lemas_tts_tpu.text.en_tn import expand_numbers
    from lemas_tts_tpu.text.pinyin import apply_tone_sandhi

    # linking 零 for lower groups with leading zeros
    assert num_to_chinese("20034") == "二万零三十四"
    assert num_to_chinese("10000234") == "一千万零二百三十四"
    # zero-padded minutes
    assert NSWNormalizer().normalize("8:05") == "八点零五分"
    # neutral-tone 不 stays neutral; 2-before-4 still applies
    assert apply_tone_sandhi("对不起", ["dui4", "bu5", "qi3"]) == \
        ["dui4", "bu5", "qi3"]
    assert apply_tone_sandhi("不是", ["bu4", "shi4"]) == ["bu2", "shi4"]
    # hyphenated ordinals
    assert "twenty-first" in expand_numbers("21st")
    assert "thirty-second" in expand_numbers("32nd")

    # add_sil: edit covering only the first word keeps the target text
    from lemas_tts_tpu.text.frontend import TextNorm

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tn = TextNorm(dtype="char")
    subs = [dict(word="hello", start=0.0, end=0.5),
            dict(word="world", start=0.6, end=1.0)]
    out = tn.add_sil(subs, 0.0, 0.55, "HI", "(en)", "(en)")
    assert any("HI" in seg for _, seg in out), out

    # raw hanzi fallback tokens never route through espeak
    phones = tn.txt2pin_phns("你好")
    assert "(zh)" in phones and "你" in phones


def test_en_ipa_builtin_g2p():
    """Vendored English IPA fallback (text/en_ipa.py, VERDICT r4 item 4):
    lexicon hits, LTS rule derivations, inflection voicing, and the espeak
    separator grammar (phones | word-sep _ | punctuation tokens)."""
    from lemas_tts_tpu.text import en_ipa

    # lexicon irregulars the rules could never derive
    assert en_ipa.word_to_phones("one") == ["w", "ʌ", "n"]
    assert en_ipa.word_to_phones("colonel") == ["k", "ɜː", "n", "əl"]
    assert en_ipa.word_to_phones("though") == ["ð", "oʊ"]
    # LTS derivations (not in the lexicon)
    assert en_ipa.word_to_phones("nation") == ["n", "eɪ", "ʃ", "ə", "n"]
    assert en_ipa.word_to_phones("walked") == ["w", "ɔː", "k", "t"]
    assert en_ipa.word_to_phones("loved") == ["l", "ʌ", "v", "d"]
    assert en_ipa.word_to_phones("wanted")[-2:] == ["ɪ", "d"]
    # inflection voicing on lexicon bases: dog+s -> z, cat-like final t -> s
    assert en_ipa.word_to_phones("dogs")[-1] == "z"
    assert en_ipa.word_to_phones("books")[-1] == "s"
    # separator grammar: word sep "_", punctuation its own token, #n intact
    out = en_ipa.txt2phone("Hello there, #2 general!")
    toks = out.split("|")
    assert "_" in toks and "," in toks and "#2" in toks and "!" in toks
    assert not any(t.isupper() for t in toks if t.isalpha())


def test_en_ipa_frontend_tier():
    """TextNorm(dtype='phone') without espeak phonemizes English through the
    builtin IPA G2P — digits expand to words, pause markers survive —
    while espeak-less non-English languages still char-fall-back."""
    import warnings as _w

    from lemas_tts_tpu.text import tokenizer as tok
    from lemas_tts_tpu.text.frontend import TextNorm

    if tok.available():  # live espeak env: the real contract applies
        import pytest

        pytest.skip("espeak present; builtin tier not the live path")
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        tn = TextNorm(dtype="phone")
    out = tn.text2phn("Page 2, #1 done.", lang="en")
    toks = out.split("|")
    assert toks[0] == "(en)" and "#1" in toks
    # 2 -> "two" (digits survive only inside the #n pause marker)
    assert not any(t.isdigit() for t in toks), out
    assert "t" in toks and "uː" in toks  # two -> t uː
    # char fallback for espeak languages without a builtin G2P (fr; es/it/id
    # route through the round-5 latin_ipa tier instead)
    out_fr = tn.text2phn("Bonjour ami.", lang="fr")
    assert out_fr.startswith("(fr)|B|o|n|j|o|u|r|")
    out_es = tn.text2phn("Hola amigo.", lang="es")
    assert out_es.startswith("(es)|o|l|a|_|a|m|i|ɡ|o")  # silent h, IPA ɡ


def test_latin_ipa_rules():
    """Language-specific contrasts the char fallback can't express — the
    ordered-rule transducer resolves context-dependent graphemes
    (text/latin_ipa.py; espeak-contract approximations, no stress)."""
    from lemas_tts_tpu.text import latin_ipa as L

    # Spanish: distinción, silent h/u, trill vs tap, ll/ñ, y allophony
    assert L.word_to_phones("cielo", "es") == ["θ", "i", "e", "l", "o"]
    assert L.word_to_phones("queso", "es") == ["k", "e", "s", "o"]
    assert L.word_to_phones("guerra", "es") == ["ɡ", "e", "r", "a"]
    assert L.word_to_phones("gente", "es") == ["x", "e", "n", "t", "e"]
    assert L.word_to_phones("año", "es") == ["a", "ɲ", "o"]
    assert L.word_to_phones("perro", "es") != L.word_to_phones("pero", "es")
    assert L.word_to_phones("voy", "es") == ["b", "o", "i"]
    assert L.word_to_phones("mayo", "es") == ["m", "a", "ʝ", "o"]
    # Italian: soft/hard c/g, gli/gn, sc, gemination collapse, intervocalic s
    assert L.word_to_phones("ciao", "it") == ["tʃ", "a", "o"]
    assert L.word_to_phones("chiesa", "it") == ["k", "i", "e", "z", "a"]
    assert L.word_to_phones("famiglia", "it") == ["f", "a", "m", "i", "ʎ", "a"]
    assert L.word_to_phones("gnocchi", "it") == ["ɲ", "o", "k", "i"]
    assert L.word_to_phones("scienza", "it") == ["ʃ", "e", "n", "t", "s", "a"]
    assert L.word_to_phones("pizza", "it") == ["p", "i", "t", "s", "a"]
    assert L.word_to_phones("casa", "it") == ["k", "a", "z", "a"]
    # Indonesian: ny/ng/sy/kh digraphs, c/j affricates, e → ə
    assert L.word_to_phones("nyonya", "id") == ["ɲ", "o", "ɲ", "a"]
    assert L.word_to_phones("bangun", "id") == ["b", "a", "ŋ", "u", "n"]
    assert L.word_to_phones("cinta", "id") == ["tʃ", "i", "n", "t", "a"]
    assert L.word_to_phones("jalan", "id") == ["dʒ", "a", "l", "a", "n"]
    assert L.word_to_phones("terima", "id") == ["t", "ə", "r", "i", "m", "a"]
    # separator grammar: pause markers survive, words separated by _
    out = L.txt2phone("hola #2 mundo", "es")
    assert "#2" in out.split("|") and "_" not in out.split("|")[0]
    # accent folding
    assert L.word_to_phones("está", "es") == ["e", "s", "t", "a"]
    assert L.word_to_phones("perché", "it") == ["p", "e", "r", "k", "e"]


def test_latin_ipa_de_ru_pt_rules():
    """Round-5 extension of the builtin tier to de/ru/pt — the hallmark
    context rules per language (espeak-contract approximations)."""
    from lemas_tts_tpu.text import latin_ipa as L

    # German: ich/ach-Laut, initial sp/st, diphthongs, final devoicing,
    # -ig, schwa/-er reduction, s-voicing, umlauts, w/v/z mappings
    assert L.word_to_phones("ich", "de") == ["ɪ", "ç"]
    assert L.word_to_phones("bach", "de") == ["b", "a", "x"]
    assert L.word_to_phones("stein", "de") == ["ʃ", "t", "aɪ", "n"]
    assert L.word_to_phones("spiel", "de") == ["ʃ", "p", "iː", "l"]
    assert L.word_to_phones("tag", "de")[-1] == "k"
    assert L.word_to_phones("könig", "de")[-2:] == ["ɪ", "ç"]
    assert L.word_to_phones("bitte", "de") == ["b", "ɪ", "t", "ə"]
    assert L.word_to_phones("wasser", "de") == ["v", "a", "s", "ɐ"]
    assert L.word_to_phones("sonne", "de")[0] == "z"
    assert L.word_to_phones("zeit", "de")[:1] == ["ts"]
    assert L.word_to_phones("schön", "de") == ["ʃ", "ø", "n"]
    # Russian: Cyrillic → IPA, iotated vowels, silent signs
    assert L.word_to_phones("привет", "ru") == ["p", "r", "i", "v", "e", "t"]
    assert L.word_to_phones("чай", "ru") == ["tʃ", "a", "j"]
    assert L.word_to_phones("юг", "ru") == ["j", "u", "ɡ"]
    assert L.word_to_phones("день", "ru") == ["d", "e", "n"]
    assert L.word_to_phones("мыло", "ru") == ["m", "ɨ", "l", "o"]
    # Portuguese (BR): palatalization, final reduction, nh/lh, ç, nasal fold
    assert L.word_to_phones("dia", "pt") == ["dʒ", "i", "a"]
    assert L.word_to_phones("gente", "pt") == ["ʒ", "e", "n", "tʃ", "i"]
    assert L.word_to_phones("cidade", "pt")[-2:] == ["dʒ", "i"]
    assert L.word_to_phones("obrigado", "pt")[-1] == "u"
    assert L.word_to_phones("senhor", "pt")[2] == "ɲ"
    assert L.word_to_phones("coração", "pt")[:4] == ["k", "o", "ɾ", "a"]
    assert L.word_to_phones("carro", "pt")[1:3] == ["a", "ʁ"]
    assert L.word_to_phones("casa", "pt") == ["k", "a", "z", "a"]


def test_latin_ipa_robustness_fuzz():
    """No input crashes the transducers, and alphabetic words always emit
    at least one phone (deterministic pseudo-fuzz across all six langs +
    mixed scripts, digits, punctuation, diacritics)."""
    import random

    from lemas_tts_tpu.text import latin_ipa as L

    rng = random.Random(0)
    alphabet = ("abcdefghijklmnopqrstuvwxyz"
                "áéíóúàèìòùâêôäöüßñçãõ"
                "абвгдеёжзийклмнопрстуфхцчшщъыьэюя")
    for lang in ("es", "it", "id", "de", "ru", "pt"):
        for _ in range(200):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 12)))
            ph = L.word_to_phones(w, lang)
            assert isinstance(ph, list)
            assert all(isinstance(p, str) and p for p in ph)
        out = L.txt2phone("a1b, #3 c-d! 42", lang)
        assert "#3" in out.split("|")
    # words made only of the language's own script always yield phones
    assert L.word_to_phones("zzyzx", "es")
    assert L.word_to_phones("щёчка", "ru")


def test_latin_ipa_review_fixes():
    """Regressions for the round-5 self-review findings."""
    from lemas_tts_tpu.text import en_ipa as E
    from lemas_tts_tpu.text import latin_ipa as L

    # (1) foreign-script words degrade to char tokens, never silently drop
    out = L.txt2phone("привет iphone мир", "ru").split("|")
    assert out == ["p", "r", "i", "v", "e", "t", "_",
                   "I", "P", "H", "O", "N", "E", "_", "m", "i", "r"], out
    assert "М" in E.txt2phone("hello мир").split("|")  # en side too
    # (2) German Dehnungs-h after ie is silent (sieht ≠ z iː h t)
    assert L.word_to_phones("sieht", "de") == ["z", "iː", "t"]
    assert L.word_to_phones("zieht", "de") == ["ts", "iː", "t"]
    # (3) apostrophe elisions join words instead of emitting a "'" token
    toks = L.txt2phone("l'acqua è bella", "it").split("|")
    assert "'" not in toks and toks[:6] == ["l", "a", "k", "k", "w", "a"]
    # (4) one shared separator-grammar walker: en delegates to the generic
    assert E.phonemize_tokens("hi there") == \
        L.phonemize_tokens_with(E.word_to_phones, "hi there")
