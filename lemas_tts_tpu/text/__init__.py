"""Host-side multilingual text frontend (10+ languages).

The TPU/host split (SURVEY.md §7): everything in this package runs on the
host CPU and produces phone-token sequences; device code consumes token ids
only. Heavy external G2P backends (espeak-ng via phonemizer, jieba, pypinyin)
are used when installed — the same external deps the reference requires — and
every component degrades gracefully to built-in pure-Python fallbacks
(char-mode frontend, heuristic language id, built-in number reading,
lexicon-based pinyin) so the framework works in hermetic environments.
"""

from lemas_tts_tpu.text.frontend import TextNorm

__all__ = ["TextNorm"]
