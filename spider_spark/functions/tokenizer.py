"""Search tokenizer — exact behavioral port of the reference automaton.

Parity target: ``SearchTokenizer.java:32-204`` (segmentation into
LATIN/CJK/UNDEF runs, digit gluing, mid-word apostrophes, >=3-char
non-letter runs, CJK unigram/bigram emission) and the golden cases in
``test/plugins/Spider/SearchTokenizerTest.java``.  This is a NEW
implementation in Python over codepoints (Python strings are codepoint
sequences, so Java's surrogate-pair handling collapses to single chars).

The hot path is the vectorized wrapper ``tokenize_series`` used from a
pandas UDF (Arrow-batched); the automaton itself is per-string Python,
which is the irreducible cost of exact parity — at scale this runs
inside ``mapInPandas`` executors, parallel across partitions.
"""

from __future__ import annotations

import unicodedata
from typing import Iterable

import pandas as pd

from .cjk import is_cjk

KEEP_NON_LETTER_MIN_CHARS = 3  # SearchTokenizer.java:22
ALLOWED_MID_WORD = "'"         # SearchTokenizer.java:23
DISCARD_IF_END_WORD = "'"      # SearchTokenizer.java:24

_MODE_UNDEF, _MODE_LATIN, _MODE_CJK = 0, 1, 2

# Java Character.isLetterOrDigit == general category L* or Nd;
# Character.isDigit == Nd.
_LETTER_CATS = frozenset(("Lu", "Ll", "Lt", "Lm", "Lo"))


def _is_letter_or_digit(ch: str) -> bool:
    cat = unicodedata.category(ch)
    return cat in _LETTER_CATS or cat == "Nd"


def _is_digit(ch: str) -> bool:
    return unicodedata.category(ch) == "Nd"


def normalize(text: str) -> str:
    """upper-then-lower normalization (SearchTokenizer.java:200-204)."""
    return text.upper().lower()


def _segment(text: str) -> tuple[list[str], list[int]]:
    """Split normalized text into (segments, modes) per the reference
    automaton (SearchTokenizer.java:42-109)."""
    segments: list[str] = []
    modes: list[int] = []
    cur_mode = _MODE_UNDEF
    sb: list[str] = []

    def _flush_word() -> None:
        # Words can't end in an apostrophe (SearchTokenizer.java:86-92).
        while sb and sb[-1] in DISCARD_IF_END_WORD:
            sb.pop()
        if sb:
            segments.append("".join(sb))
            modes.append(cur_mode)

    for ch in text:
        if _is_letter_or_digit(ch):
            cp = ord(ch)
            if is_cjk(cp):
                if cur_mode == _MODE_LATIN and sb:
                    segments.append("".join(sb))
                    modes.append(cur_mode)
                    sb = []
                cur_mode = _MODE_CJK
            elif not _is_digit(ch):
                if cur_mode == _MODE_CJK and sb:
                    segments.append("".join(sb))
                    modes.append(cur_mode)
                    sb = []
                cur_mode = _MODE_LATIN
            # digits glue to the current run without changing mode
            sb.append(ch)
        elif sb:
            if ch in ALLOWED_MID_WORD:
                # allow apostrophes mid-word (SearchTokenizer.java:74-81)
                sb.append(ch)
                continue
            if cur_mode != _MODE_UNDEF or len(sb) >= KEEP_NON_LETTER_MIN_CHARS:
                _flush_word()
            cur_mode = _MODE_UNDEF
            sb = []

    if sb:
        _flush_word()
    return segments, modes


def _cjk_emit(seg: str, return_pairs: bool) -> Iterable[str]:
    """CJK run → unigrams (+ bigrams between them when return_pairs),
    skipping embedded non-CJK chars as singles (SearchTokenizer.java:175-194)."""
    last: str | None = None
    for ch in seg:
        if last is not None and return_pairs:
            yield last + ch
        if is_cjk(ord(ch)):
            yield ch
        last = ch


def tokenize(text: str, return_pairs: bool = False) -> list[str]:
    """Tokenize one text block.  Production indexing uses
    return_pairs=False for accurate positions (Spider.java:682-684)."""
    if text is None:
        return []
    segments, modes = _segment(normalize(text))
    out: list[str] = []
    for seg, mode in zip(segments, modes):
        if mode == _MODE_CJK:
            out.extend(_cjk_emit(seg, return_pairs))
        else:  # LATIN and UNDEF both emit the raw segment
            out.append(seg)
    return out


def tokenize_series(texts: pd.Series, return_pairs: bool = False) -> pd.Series:
    """Arrow-batch wrapper: Series[str] -> Series[list[str]]."""
    return texts.map(lambda t: tokenize(t, return_pairs) if t is not None else [])


# ---- stop words (SearchUtil.java:32-54) -----------------------------------

STOP_WORDS = frozenset({"the", "and", "that", "have", "for"})


def is_stop_word(word: str) -> bool:
    """Stop iff in the English list, or shorter than 3 codepoints unless
    CJK (a digit+CJK pair is kept)."""
    if word in STOP_WORDS:
        return True
    n = len(word)
    if n < 3:
        if is_cjk(ord(word[0])):
            return False
        if n == 2:
            return not is_cjk(ord(word[1]))
        return True
    return False
