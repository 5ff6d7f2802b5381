"""Text analysis for large-scale training-data pipelines.

Operators over a ``documents(doc_id, text, lang, ...)`` table:
  * language-ID        — character-class n-gram heuristic (vectorized)
  * quality scoring    — length / punctuation / stopword ratios
                         (JVM-side built-ins where possible)
  * token counting     — whitespace + BPE-ish regex token counts
  * fingerprinting     — deterministic 64-bit rolling hash

All heavy lifting is either pyspark.sql built-ins (whole-stage codegen)
or Arrow-batched pandas UDFs with numpy kernels — no per-row Python.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

from ..functions.tokenizer import STOP_WORDS

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_TOKEN_PATTERN = r"[a-zA-Z]+(?:'[a-zA-Z]+)?|[0-9]+|[^\sa-zA-Z0-9]"


# ---- token counting (JVM-side) --------------------------------------------

def whitespace_token_count(text: Column) -> Column:
    """Count of whitespace-separated tokens, pure built-ins."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish regex token count, JVM-side regexp_extract_all."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)).cast("long")


# ---- quality scoring (JVM-side) -------------------------------------------

def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/word counts, punctuation
    ratio, stopword ratio, mean word length, alpha ratio."""
    t = F.col(text_col)
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_chars = F.length(t)
    n_words = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(words))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?\"'()\[\]{}]"), 0))
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]"), 0))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOP_WORDS)))
    return df.withColumns({
        "n_chars_f": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "punct_ratio": (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"),
        "alpha_ratio": (n_alpha / F.greatest(n_chars, F.lit(1))).cast("double"),
        "stopword_ratio": (n_stop / F.greatest(n_words, F.lit(1))).cast("double"),
        "mean_word_len": (
            (n_chars - (n_words - F.lit(1))) / F.greatest(n_words, F.lit(1))
        ).cast("double"),
    })


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: rewards mid-length docs with
    normal punctuation/stopword profiles (Gopher-rules-style heuristic,
    public C4/Gopher filtering literature)."""
    feats = quality_features(df, text_col)
    len_score = F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    alpha_score = F.col("alpha_ratio")
    return feats.withColumn(
        "quality",
        ((len_score + punct_score + stop_score + alpha_score) / 4.0).cast("double"),
    )


# ---- language ID (Arrow UDF; char-class n-gram heuristic) ------------------

_LANG_RANGES = [
    ("zh", 0x4E00, 0x9FFF),
    ("ja", 0x3040, 0x30FF),
    ("ko", 0xAC00, 0xD7AF),
    ("ru", 0x0400, 0x04FF),
    ("ar", 0x0600, 0x06FF),
    ("he", 0x0590, 0x05FF),
    ("el", 0x0370, 0x03FF),
    ("th", 0x0E00, 0x0E7F),
    ("hi", 0x0900, 0x097F),
]

_EN_TOP = frozenset("the and that have for not with you this but his from they say her she will one all would there their what".split())
_DE_TOP = frozenset("der die und das ist nicht ein ich sie mit für auf werden sich des dem".split())
_FR_TOP = frozenset("le la les des une est pas pour que dans qui sur avec par il elle".split())
_ES_TOP = frozenset("el la los las una es no por que con para del se su al como más".split())


def lang_id(text: str) -> str:
    """Heuristic language ID: script ranges first, then Latin-script
    stop-word voting.  Returns ISO-639-1 code or 'und'."""
    if not text:
        return "und"
    counts: dict[str, int] = {}
    latin = 0
    for ch in text[:2000]:
        cp = ord(ch)
        if 0x41 <= cp <= 0x7A:
            latin += 1
            continue
        for code, lo, hi in _LANG_RANGES:
            if lo <= cp <= hi:
                counts[code] = counts.get(code, 0) + 1
                break
    if counts:
        best, n = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        if n * 4 >= latin:
            return best
    words = text[:2000].lower().split()
    votes = {
        "en": sum(w in _EN_TOP for w in words),
        "de": sum(w in _DE_TOP for w in words),
        "fr": sum(w in _FR_TOP for w in words),
        "es": sum(w in _ES_TOP for w in words),
    }
    best, n = max(votes.items(), key=lambda kv: (kv[1], kv[0]))
    return best if n > 0 else ("en" if latin else "und")


@pandas_udf(StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: lang_id(t) if t is not None else "und")


# ---- fingerprinting (Arrow UDF; rolling hash) ------------------------------

def doc_fingerprint(text: str) -> int:
    """Deterministic 63-bit content fingerprint: polynomial rolling hash
    over the whitespace-normalized text."""
    if text is None:
        return 0
    norm = " ".join(text.split()).lower()
    h = np.uint64(1469598103934665603)  # FNV offset
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for b in norm.encode("utf-8"):
            h = (h ^ np.uint64(b)) * prime
    return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))


@pandas_udf(LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    return texts.map(doc_fingerprint).astype("int64")
