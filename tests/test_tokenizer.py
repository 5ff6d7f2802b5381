"""Golden tests for the tokenizer automaton.

Cases ported behaviorally from the reference's only test file
(test/plugins/Spider/SearchTokenizerTest.java:8-176) — those construct the
tokenizer with pairs=True; production indexing uses pairs=False
(Spider.java:682-684), covered by additional cases below.
"""

import pytest

from spider_spark.functions.tokenizer import (
    is_stop_word,
    tokenize,
    tokenize_series,
)

import pandas as pd


def compare(text, expected, pairs=True):
    assert tokenize(text, return_pairs=pairs) == expected, text


def test_english():
    hello_world = ["hello", "world"]
    for t in [
        "Hello World",
        "hello    world",
        "hello    world  ",
        "hello\nworld  ",
        "hello\n world  ",
        "hello, world  ",
        "hello, world! ",
        "hello, world!",
    ]:
        compare(t, hello_world)


def test_cjk_chinese():
    # NOTE: the Java golden (SearchTokenizerTest.java:22-29) lists only 6
    # tokens, but its compare() harness consumes one extra trailing token
    # inside a debug println (SearchTokenizerTest.java:191-193) before
    # asserting exhaustion — the automaton genuinely emits the final "四".
    compare(
        "一二三四",
        ["一", "一二", "二", "二三", "三", "三四", "四"],
    )


def test_cjk_chinese_ext_b():
    # Java's surrogate pair 𣎴 == U+233B4 (one Python char)
    ext_b = "\U000233B4"
    compare(
        "樹" + ext_b + "子",
        ["樹", "樹" + ext_b, ext_b, ext_b + "子", "子"],
    )


def test_cjk_chinese_punctuation():
    compare(
        "起初，　神創造天地。",
        [
            "起", "起初", "初",
            "神", "神創", "創", "創造", "造",
            "造天", "天", "天地", "地",
        ],
    )


def test_cjk_korean():
    compare(
        "태초에하나님이천지를창조하시니라!",
        [
            "태", "태초", "초", "초에", "에",
            "에하", "하", "하나", "나", "나님",
            "님", "님이", "이", "이천", "천",
            "천지", "지", "지를", "를", "를창",
            "창", "창조", "조", "조하", "하",
            "하시", "시", "시니", "니", "니라",
            "라",
        ],
    )


def test_cjk_japanese():
    compare(
        "はじめに神は天と地とを創造された。",
        [
            "は", "はじ", "じ", "じめ", "め",
            "めに", "に", "に神", "神", "神は",
            "は", "は天", "天", "天と", "と",
            "と地", "地", "地と", "と", "とを",
            "を", "を創", "創", "創造", "造",
            "造さ", "さ", "され", "れ", "れた",
            "た",
        ],
    )


def test_mixed():
    compare("一" + "1" + "丁",
            ["一", "一" + "1", "1" + "丁", "丁"])
    compare("一" + "1" + "a", ["一", "一" + "1", "a"])
    compare("一" + "a" + "丁", ["一", "a", "丁"])
    compare("a1a", ["a1a"])
    compare("a1a一丁", ["a1a", "一", "一丁", "丁"])
    compare("a1一丁", ["a1", "一", "一丁", "丁"])
    compare("a1 一丁", ["a1", "一", "一丁", "丁"])


def test_pairs_false_production_mode():
    # Spider.java:682-684 disables pairs for positional accuracy
    compare("一二三", ["一", "二", "三"], pairs=False)
    compare("Hello World", ["hello", "world"], pairs=False)
    compare("一" + "1" + "丁", ["一", "丁"], pairs=False)


def test_apostrophes():
    # mid-word apostrophes kept, trailing stripped (SearchTokenizer.java:23-24,74-92)
    compare("don't", ["don't"], pairs=False)
    compare("cats'", ["cats"], pairs=False)
    compare("'tis", ["tis"], pairs=False)  # no leading sb → apostrophe dropped


def test_non_letter_runs():
    # pure-digit (UNDEF) runs: <3 chars dropped at a separator, >=3 kept
    # (KEEP_NON_LETTER_MIN_CHARS=3, SearchTokenizer.java:84).  Quirk preserved
    # from the reference: the END-of-input flush has no length check
    # (SearchTokenizer.java:100-109), so a short digit run at the very end
    # IS emitted.
    compare("12 345", ["345"], pairs=False)
    compare("1234", ["1234"], pairs=False)
    compare("hello 42 world", ["hello", "world"], pairs=False)
    compare("hello 42", ["hello", "42"], pairs=False)  # end-flush quirk


def test_normalization():
    compare("HeLLo WoRLD", ["hello", "world"], pairs=False)


def test_stop_words():
    for w in ("the", "and", "that", "have", "for"):
        assert is_stop_word(w)
    assert is_stop_word("a")        # too short
    assert is_stop_word("ab")       # too short, not CJK
    assert not is_stop_word("abc")
    assert not is_stop_word("一")       # single CJK kept
    assert not is_stop_word("1丁")      # digit+CJK pair kept
    assert is_stop_word("12")               # digit pair dropped


def test_tokenize_series():
    s = pd.Series(["Hello World", None, "一二"])
    out = tokenize_series(s)
    assert out.tolist() == [["hello", "world"], [], ["一", "二"]]


# --- ASCII fast path equivalence --------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from spider_spark.functions.tokenizer import _tokenize_ascii, _tokenize_automaton

_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=127),
    max_size=200,
)


@settings(max_examples=500, deadline=None)
@given(_ascii_text)
def test_ascii_fast_path_equals_automaton(text):
    assert _tokenize_ascii(text.lower()) == _tokenize_automaton(text)


def test_ascii_fast_path_quirks():
    # mid-string short digit runs drop; end-of-string flush keeps them
    assert _tokenize_ascii("a1 12 b") == ["a1", "b"]
    assert _tokenize_ascii("a1 12") == ["a1", "12"]
    # trailing apostrophes count toward the length check, then strip
    assert _tokenize_ascii("12' x") == ["12", "x"]
    assert _tokenize_ascii("12 x") == ["x"]
    # apostrophe glue: leading skipped, mid kept, trailing stripped
    assert _tokenize_ascii("'don't' o'brien") == ["don't", "o'brien"]


def test_ascii_fast_path_speedup():
    """The fast path must actually be fast: >=2x over the automaton on
    representative latin text (VERDICT r1 item 6's done-criterion is
    measured in bench; this is the guardrail).

    Wall-clock guardrails flake on a loaded host (VERDICT r3 #3), so
    this compares the BEST of 5 interleaved reps of each side — a
    scheduler preemption inflates some reps but not the minimum —
    and the threshold is 2x, not the ~5x seen on an idle box."""
    import time

    text = ("the quick brown fox jumps over the lazy dog's back 1234 "
            "o'brien don't example.com x42 b2b2b ") * 50
    t_fast = []
    t_slow = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(50):
            fast = _tokenize_ascii(text)
        t_fast.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(50):
            slow = _tokenize_automaton(text)
        t_slow.append(time.perf_counter() - t0)
    assert fast == slow
    ratio = min(t_slow) / min(t_fast)
    assert ratio >= 2, f"fast path only {ratio:.1f}x"


def test_jvm_ascii_twin_matches_python(spark):
    """tokens_col (the parse hot path — the Arrow UDF since round 4;
    the UDF dispatches ASCII rows to a C-regex fast path internally)
    AND the JVM-expression ASCII twin (udfs.tokenize_ascii_col, kept
    for oracle-SQL parity queries) must both agree with the Python
    tokenizer — the twin on its ASCII validity domain, tokens_col on
    every input.  Covers the documented quirks (end-of-string flush,
    apostrophe glue and strip, digit-run length rule) plus seeded
    random ASCII soup."""
    import random

    import pyspark.sql.functions as F

    from spider_spark.functions.udfs import tokens_col

    cases = [
        "", "'", "''", "'''", "a", "ab", "abc",
        "1", "12", "123", "1234", "a1", "1a",
        "don't", "don't ", "'tis", "''tis", "rock'n'roll", "abc'''",
        "ab'c'", "12'3", "1'2", "1''", "12' x", "12 x",
        "a1 12 b", "a1 12", "foo 12'", "foo 12 ",
        # trailing line terminator: Java $ would falsely treat the run
        # as end-of-string-flushed; \z must not
        "0\n", "b 1\n", "12\n", "12\r\n", "a 9b1,-1\n",
        "hello, world!", "hello\nworld", "hello\tworld  ",
        "HeLLo WoRLD", "'don't' o'brien",
        "x" * 300, ("ab1' " * 40).strip(),
        # non-ASCII → automaton fallback
        "héllo", "一二三四", "abc一二def", "naïve café", "𣎴",
        "mixed ascii 然后 more",
    ]
    rng = random.Random(42)
    alphabet = "abz019'  .,\n\t!-_"
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
              for _ in range(250)]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i int, text string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_col(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(cases):
        assert got[i] == tokenize(t), f"case {i}: {t!r}"

    from spider_spark.functions.udfs import _ASCII_ONLY_RE, tokenize_ascii_col
    twin = {
        r["i"]: r["toks"]
        for r in df.filter(F.col("text").rlike(_ASCII_ONLY_RE))
        .select("i", tokenize_ascii_col(F.col("text")).alias("toks"))
        .collect()
    }
    assert twin, "no ASCII cases reached the twin"
    for i, toks in twin.items():
        assert toks == tokenize(cases[i]), f"twin case {i}: {cases[i]!r}"
