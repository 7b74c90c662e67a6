"""GPT-2-exact pretokenization (round 11, t55): the Python reference
scanner vs the JVM regex the engine runs — hand-picked grammar corners,
a full-BMP whitespace-class probe, and hypothesis equivalence over a
category-diverse alphabet."""

from __future__ import annotations

import pytest

from youbike_etl_pipeline_spark.operators.gpt2 import (
    GPT2_PRETOKEN_RE,
    WHITESPACE,
    gpt2_pretokenize,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


CASES = {
    # contractions: case-sensitive, fire only AT the apostrophe
    "isn't it": ["isn", "'t", " it"],
    "we'll they're": ["we", "'ll", " they", "'re"],
    "I'm you've he'd she's": ["I", "'m", " you", "'ve", " he", "'d", " she", "'s"],
    "CAN'T": ["CAN", "'", "T"],  # uppercase suffix -> punct run + letter run
    "!!'t x": ["!!'", "t", " x"],  # scanner never lands on the apostrophe
    "''s": ["''", "s"],
    "'d": ["'d"],
    " 's": [" '", "s"],  # alt-4 takes the space; contraction needs position
    # leading-space attachment
    "a b": ["a", " b"],
    " the": [" the"],
    "x  y": ["x", " ", " y"],  # run of 2: all-but-last, last leads 'y'
    "x   y": ["x", "  ", " y"],
    # digits and mixed runs
    "42km2 3.14": ["42", "km", "2", " 3", ".", "14"],
    " 100%": [" 100", "%"],
    # whitespace tails
    "x ": ["x", " "],  # EOS run consumed whole
    "x  ": ["x", "  "],
    "\tx": ["\t", "x"],  # tab is not the literal optional space
    "x\t\ty": ["x", "\t", "\t", "y"],
    # unicode letters: accents and CJK are \p{L} — CJK runs stay WHOLE
    "l'été déjà": ["l", "'", "été", " déjà"],
    "的是的 是的": ["的是的", " 是的"],
    "N°5": ["N", "°", "5"],
    "": [],
    " ": [" "],
    "  ": ["  "],
}


def test_reference_scanner_cases():
    for text, want in CASES.items():
        assert gpt2_pretokenize(text) == want, repr(text)


def test_pretokens_concatenate_back():
    for text in CASES:
        assert "".join(gpt2_pretokenize(text)) == text, repr(text)


def _jvm_pretokenize(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = (
        df.select(
            "i", F.regexp_extract_all("t", F.lit(GPT2_PRETOKEN_RE), 0).alias("p")
        )
        .orderBy("i")
        .collect()
    )
    return [list(r["p"]) for r in rows]


def test_jvm_pattern_matches_scanner_on_cases(spark):
    texts = list(CASES)
    got = _jvm_pretokenize(spark, texts)
    for text, jvm in zip(texts, got):
        assert jvm == gpt2_pretokenize(text), repr(text)


def test_whitespace_class_is_the_jvm_class(spark):
    """Probe EVERY BMP codepoint (minus surrogates) against the JVM's
    (?U)\\s — WHITESPACE must equal the engine's class exactly."""
    from pyspark.sql import functions as F

    chunks = []
    step = 2048
    # 0x01.. covers the control range (incl. the U+001C-1F corner the
    # JDK adds to \s); NUL is skipped only for transport paranoia
    points = [c for c in range(0x01, 0x10000) if not 0xD800 <= c <= 0xDFFF]
    rows = [(i, "".join(map(chr, points[i : i + step]))) for i in range(0, len(points), step)]
    df = spark.createDataFrame(rows, "i long, t string")
    out = (
        df.select("i", F.regexp_replace("t", F.lit("(?U)[^\\s]"), F.lit("")).alias("ws"))
        .orderBy("i")
        .collect()
    )
    jvm_ws = set("".join(r["ws"] for r in out))
    assert jvm_ws == set(WHITESPACE)


if HAVE_HYPOTHESIS:
    # category-diverse alphabet, stable across JVM/Python Unicode
    # versions: ASCII, Latin-1 letters/symbols, Greek, Cyrillic, CJK,
    # non-ASCII digits, real whitespace (NOT U+001C-1F, where the
    # Python `re`/`regex` modules and spec paraphrases disagree — the
    # engine's class is pinned separately by the full-BMP probe above)
    _ALPHABET = (
        "abcXYZ019'’ \t\n\xa0　 !?.,-_%$§°«"
        "éüßñΩλЖд的是九٣३一二"
    )

    @given(st.text(alphabet=_ALPHABET, min_size=0, max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_scanner_total_and_lossless(text):
        toks = gpt2_pretokenize(text)
        assert "".join(toks) == text
        assert all(toks)  # no empty pretokens


@pytest.mark.parametrize("seed", range(4))
def test_jvm_equivalence_random_batches(spark, seed):
    """Deterministic pseudo-random batch equivalence vs the JVM pattern
    (bulk form of the hypothesis property, one Spark job per seed)."""
    import random

    rng = random.Random(1000 + seed)
    alphabet = (
        "abcXYZ019'’ \t\n\xa0　 !?.,-_%$§°«éüßñΩλЖд的是九٣३一二"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(300)
    ]
    got = _jvm_pretokenize(spark, texts)
    for text, jvm in zip(texts, got):
        assert jvm == gpt2_pretokenize(text), repr(text)
