"""Vectorized (Arrow-batched) pandas UDFs + JVM-side expression helpers.

The `input_hint` mandates pandas/Arrow UDFs only — no per-row Python.
Everything that CAN stay JVM-side does (stop-word predicate, CJK char
classes via regex, positions via windows); Python appears only where
exact automaton parity demands it (tokenizer, canonicalizer, URL
extraction, bloom probe).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType, BooleanType

from pyspark.sql.types import LongType

from .cjk import _CJK_RANGES
from .tokenizer import STOP_WORDS, tokenize_series
from .urlnorm import canonicalize_series, edition_series, host_series


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Exact SearchTokenizer automaton, pairs=False (Spider.java:682-684)."""
    return tokenize_series(texts, return_pairs=False)


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return host_series(urls)


@pandas_udf(LongType())
def edition_udf(urls: pd.Series) -> pd.Series:
    return edition_series(urls)


# ---- JVM-side expression builders -----------------------------------------

def cjk_char_class() -> str:
    """Java-regex character class covering the reference's CJK blocks
    (SearchUtil.java:8-30), incl. supplementary planes via \\x{...}."""
    parts = []
    for lo, hi in _CJK_RANGES:
        parts.append(f"\\x{{{lo:X}}}-\\x{{{hi:X}}}")
    return "[" + "".join(parts) + "]"


_CJK_CLASS = cjk_char_class()


def keep_token(tok: Column) -> Column:
    """JVM-side stop-word predicate — behavioral mirror of
    SearchUtil.isStopWord (SearchUtil.java:36-54), negated.

    Keep iff: not an English stop word AND (>=3 codepoints OR first char
    CJK OR (2 chars and second char CJK))."""
    n = F.length(tok)
    first_cjk = F.substring(tok, 1, 1).rlike("^" + _CJK_CLASS + "$")
    second_cjk = F.substring(tok, 2, 1).rlike("^" + _CJK_CLASS + "$")
    return (~tok.isin(*STOP_WORDS)) & (
        (n >= 3) | first_cjk | ((n == 2) & second_cjk)
    )


def badlist_extension_regex(extensions: tuple[str, ...]) -> str:
    """One compiled alternation for the extension badlist suffix test
    (Spider.java:156-162; list db/Config.java:48-56)."""
    import re as _re

    return "(" + "|".join(_re.escape(e) for e in extensions) + ")$"


def url_path(url: Column) -> Column:
    """Path component of a canonical URL, JVM-side."""
    p = F.regexp_extract(url, r"^https?://[^/]+(/[^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)
