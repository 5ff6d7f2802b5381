"""Search tokenizer — exact behavioral port of the reference automaton.

Parity target: ``SearchTokenizer.java:32-204`` (segmentation into
LATIN/CJK/UNDEF runs, digit gluing, mid-word apostrophes, >=3-char
non-letter runs, CJK unigram/bigram emission) and the golden cases in
``test/plugins/Spider/SearchTokenizerTest.java``.  This is a NEW
implementation in Python over codepoints (Python strings are codepoint
sequences, so Java's surrogate-pair handling collapses to single chars).

The hot path is the vectorized wrapper ``tokenize_series`` used from a
pandas UDF (Arrow-batched).  Pure-ASCII strings — the overwhelming
share of web text — take a C-level regex fast path that reproduces the
automaton's ASCII behavior exactly (including the mid-string
3-char-digit-run drop, the end-of-string flush quirk, apostrophe glue
and trailing-apostrophe strip); anything non-ASCII falls back to the
per-codepoint automaton, the irreducible cost of exact CJK parity.
Equivalence of the two paths on ASCII input is pinned by a property
test (tests/test_tokenizer.py).
"""

from __future__ import annotations

import re
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


# Per-character class cache — the automaton's hot loop does one dict
# lookup per char instead of unicodedata + range binary search.  Class
# codes mirror the reference's branch order (CJK test first,
# SearchTokenizer.java:50-69): 0 separator, 1 latin letter, 2 digit,
# 3 CJK, 4 apostrophe (separator with mid-word glue).
_CLS_SEP, _CLS_LATIN, _CLS_DIGIT, _CLS_CJK, _CLS_APOS = 0, 1, 2, 3, 4
_char_cls: dict[str, int] = {}


def _classify(ch: str) -> int:
    if _is_letter_or_digit(ch):
        if is_cjk(ord(ch)):
            cls = _CLS_CJK
        elif _is_digit(ch):
            cls = _CLS_DIGIT
        else:
            cls = _CLS_LATIN
    elif ch in ALLOWED_MID_WORD:
        cls = _CLS_APOS
    else:
        cls = _CLS_SEP
    _char_cls[ch] = cls
    return cls


# pre-warm ASCII
for _c in map(chr, range(128)):
    _classify(_c)


def _segment(text: str) -> tuple[list[str], list[int]]:
    """Split normalized text into (segments, modes) per the reference
    automaton (SearchTokenizer.java:42-109)."""
    segments: list[str] = []
    modes: list[int] = []
    cur_mode = _MODE_UNDEF
    sb: list[str] = []
    cls_map = _char_cls
    classify = _classify
    seg_append = segments.append
    mode_append = modes.append
    sb_append = sb.append

    def _flush_word() -> None:
        # Words can't end in an apostrophe (SearchTokenizer.java:86-92).
        while sb and sb[-1] in DISCARD_IF_END_WORD:
            sb.pop()
        if sb:
            seg_append("".join(sb))
            mode_append(cur_mode)

    for ch in text:
        cls = cls_map.get(ch)
        if cls is None:
            cls = classify(ch)
        if cls >= _CLS_APOS:  # apostrophe
            if sb:
                sb_append(ch)  # mid-word glue (SearchTokenizer.java:74-81)
            continue
        if cls:  # letter or digit
            if cls == _CLS_CJK:
                if cur_mode == _MODE_LATIN and sb:
                    seg_append("".join(sb))
                    mode_append(cur_mode)
                    sb = []
                    sb_append = sb.append
                cur_mode = _MODE_CJK
            elif cls == _CLS_LATIN:
                if cur_mode == _MODE_CJK and sb:
                    seg_append("".join(sb))
                    mode_append(cur_mode)
                    sb = []
                    sb_append = sb.append
                cur_mode = _MODE_LATIN
            # digits glue to the current run without changing mode
            sb_append(ch)
        elif sb:
            if cur_mode != _MODE_UNDEF or len(sb) >= KEEP_NON_LETTER_MIN_CHARS:
                _flush_word()
            cur_mode = _MODE_UNDEF
            sb = []
            sb_append = sb.append

    if sb:
        _flush_word()
    return segments, modes


def _cjk_emit(seg: str, return_pairs: bool) -> Iterable[str]:
    """CJK run → unigrams (+ bigrams between them when return_pairs),
    skipping embedded non-CJK chars as singles (SearchTokenizer.java:175-194)."""
    cls_map = _char_cls
    last: str | None = None
    for ch in seg:
        if last is not None and return_pairs:
            yield last + ch
        cls = cls_map.get(ch)
        if cls is None:
            cls = _classify(ch)
        if cls == _CLS_CJK:
            yield ch
        last = ch


# --- ASCII fast path ---------------------------------------------------
#
# For ASCII input the automaton reduces to: candidate runs are
# [a-z0-9][a-z0-9']* (leading apostrophes are skipped while sb is
# empty); a run is EMITTED iff it contains a letter (mode became LATIN)
# OR its raw length (trailing apostrophes included) is >= 3 OR it is
# terminated by end-of-string (the final flush has no mode/length
# check — SearchTokenizer.java:104-108's quirk, pinned by the Java
# golden tests); the emitted token is the run with trailing
# apostrophes stripped.  All matching is C-level regex.

_ASCII_RUN = re.compile(r"[a-z0-9][a-z0-9']*")
_HAS_ALPHA = re.compile(r"[a-z]")


def _tokenize_ascii(text: str) -> list[str]:
    runs = _ASCII_RUN.findall(text)
    if not runs:
        return []
    # the final flush quirk applies iff the last run extends to the end
    # of the string; maximal matching makes endswith an exact test
    last_at_end = text.endswith(runs[-1])
    last_idx = len(runs) - 1
    out: list[str] = []
    append = out.append
    search = _HAS_ALPHA.search
    for idx, run in enumerate(runs):
        if "'" in run:  # rare: apostrophe glue + trailing strip
            if (search(run) or len(run) >= KEEP_NON_LETTER_MIN_CHARS
                    or (idx == last_idx and last_at_end)):
                append(run.rstrip("'"))
        elif (not run.isdigit() or len(run) >= KEEP_NON_LETTER_MIN_CHARS
                or (idx == last_idx and last_at_end)):
            append(run)
    return out


def tokenize(text: str, return_pairs: bool = False) -> list[str]:
    """Tokenize one text block.  Production indexing uses
    return_pairs=False for accurate positions (Spider.java:682-684)."""
    if text is None:
        return []
    if text.isascii():
        # ASCII never reaches the CJK emitter, so return_pairs is moot
        return _tokenize_ascii(text.lower())
    segments, modes = _segment(normalize(text))
    out: list[str] = []
    for seg, mode in zip(segments, modes):
        if mode == _MODE_CJK:
            out.extend(_cjk_emit(seg, return_pairs))
        else:  # LATIN and UNDEF both emit the raw segment
            out.append(seg)
    return out


def _tokenize_automaton(text: str, return_pairs: bool = False) -> list[str]:
    """Automaton-only path (bypasses the ASCII shortcut) — used by the
    fast-path equivalence property test."""
    segments, modes = _segment(normalize(text))
    out: list[str] = []
    for seg, mode in zip(segments, modes):
        if mode == _MODE_CJK:
            out.extend(_cjk_emit(seg, return_pairs))
        else:
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
        c0 = _char_cls.get(word[0])
        if (c0 if c0 is not None else _classify(word[0])) == _CLS_CJK:
            return False
        if n == 2:
            c1 = _char_cls.get(word[1])
            return (c1 if c1 is not None else _classify(word[1])) != _CLS_CJK
        return True
    return False
