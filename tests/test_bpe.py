"""BPE merge application (round 9): the standard lowest-rank-first
encoder loop vs the oracle's fixpoint-REPLACE derivation (hypothesis-
pinned equivalence under the operands-exist-before-use invariant), and
the distinct-word Spark route t50 grades."""

from __future__ import annotations

import re

import pytest

from youbike_etl_pipeline_spark.operators.text import (
    BPE_MERGES,
    bpe_apply,
    bpe_apply_fixpoint,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def test_merge_table_invariant():
    """Every merge's operands must be base characters or outputs of
    EARLIER merges — the invariant both the equivalence proof and any
    real learned BPE table satisfy."""
    known = {chr(c) for c in range(ord("a"), ord("z") + 1)}
    for a, b in BPE_MERGES:
        assert a in known and b in known, (a, b)
        known.add(a + b)


def test_known_tokenizations():
    cases = {
        "the": ["the"],
        "then": ["the", "n"],
        "there": ["the", "re"],
        "and": ["and"],
        "ingrate": ["ing", "r", "at", "e"],
        "nothing": ["n", "o", "th", "ing"],
        "rendering": ["re", "n", "d", "er", "ing"],
        "a": ["a"],
        "zzz": ["z", "z", "z"],
    }
    for w, want in cases.items():
        assert bpe_apply(w) == want, w
        assert "".join(bpe_apply(w)) == w


def test_overlapping_runs_left_to_right():
    """Left-to-right non-overlap: 'aaa' with an (a,a) merge → (aa)(a),
    and the fixpoint derivation needs its second pass to agree."""
    merges = (("a", "a"),)
    assert bpe_apply("aaa", merges) == ["aa", "a"]
    assert bpe_apply_fixpoint("aaa", merges) == ["aa", "a"]
    assert bpe_apply("aaaa", merges) == ["aa", "aa"]
    assert bpe_apply_fixpoint("aaaa", merges) == ["aa", "aa"]
    # chained: (a,a) then (aa,aa)
    merges2 = (("a", "a"), ("aa", "aa"))
    assert bpe_apply("aaaaa", merges2) == ["aaaa", "a"]
    assert bpe_apply_fixpoint("aaaaa", merges2) == ["aaaa", "a"]


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghinorst", min_size=1, max_size=24))
def test_fixpoint_equivalence(word):
    """The recursive-CTE algorithm the DuckDB oracle runs must equal
    standard BPE for every word over the merge alphabet."""
    a = bpe_apply(word)
    b = bpe_apply_fixpoint(word)
    assert a == b
    assert "".join(a) == word


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="abcd", min_size=1, max_size=16),
    st.lists(
        st.tuples(
            st.sampled_from(list("abcd")), st.sampled_from(list("abcd"))
        ),
        min_size=0,
        max_size=6,
    ),
)
def test_fixpoint_equivalence_random_valid_tables(word, base_pairs):
    """Equivalence holds for ANY merge table satisfying the invariant,
    not just the shipped one: grow a random valid table where later
    merges may consume earlier outputs."""
    merges: list[tuple[str, str]] = []
    symbols = list("abcd")
    for i, (a, b) in enumerate(base_pairs):
        # every other merge, use a previously created symbol as operand
        if merges and i % 2 == 1:
            a = merges[len(merges) // 2][0] + merges[len(merges) // 2][1]
        if (a, b) not in merges:
            merges.append((a, b))
            symbols.append(a + b)
    table = tuple(merges)
    assert bpe_apply(word, table) == bpe_apply_fixpoint(word, table)


def test_duckdb_oracle_matches_python_bpe():
    """The generated recursive CTE, run in DuckDB itself, must agree
    with the Python encoder word-for-word on real corpus text."""
    import duckdb

    from youbike_etl_pipeline_spark.plans.corpus import _t50_bpe_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    oracle = {r[0]: r[1:] for r in con.execute(_t50_bpe_sql()).fetchall()}
    docs = con.execute("SELECT doc_id, COALESCE(text,'') FROM documents").fetchall()
    checked = 0
    for did, text in docs:
        words = re.findall("[a-z]+", text.lower())
        if not words:
            assert did not in oracle
            continue
        checked += 1
        n_tok = sum(len(bpe_apply(w)) for w in words)
        assert oracle[did][:2] == (len(words), n_tok), did
    assert checked >= 5


@pytest.mark.usefixtures("spark")
def test_t50_end_to_end_spark(spark):
    """The distinct-word Spark route: explode → distinct → Arrow
    tokenize → rejoin → per-doc aggregate, vs a direct per-doc Python
    computation on sf0.001."""
    import duckdb

    from youbike_etl_pipeline_spark.plans.corpus import CORPUS

    df = CORPUS["t50_bpe_encode"].fn(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r for r in df.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    docs = con.execute("SELECT doc_id, COALESCE(text,'') FROM documents").fetchall()
    n_with_words = 0
    for did, text in docs:
        words = re.findall("[a-z]+", text.lower())
        if not words:
            assert did not in rows
            continue
        n_with_words += 1
        n_tok = sum(len(bpe_apply(w)) for w in words)
        r = rows[did]
        assert r["n_words"] == len(words)
        assert r["n_tokens"] == n_tok
        assert abs(r["tokens_per_word"] - n_tok / len(words)) < 1e-6
    assert len(rows) == n_with_words
