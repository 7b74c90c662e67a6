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


# ------------------------------------------------------ round 10: byte-level


def test_byte_bpe_known_tokenizations():
    from youbike_etl_pipeline_spark.operators.text import byte_bpe_apply

    # 'the' merges fully via th -> the; hex symbols are the alphabet
    assert byte_bpe_apply("the") == ["746865"]
    # ü (C3 BC) merges, then crosses the char boundary with 'b' (über)
    assert byte_bpe_apply("über") == ["C3BC62", "6572"]
    # 的 (E7 9A 84) and 是 (E6 98 AF) each collapse to one 3-byte token
    assert byte_bpe_apply("的是") == ["E79A84", "E698AF"]
    # unmerged octets stay single-byte tokens: ñ = C3 B1 (no ñ merge,
    # and C3 must NOT pair with B1 just because C3 merges elsewhere)
    assert byte_bpe_apply("ñ") == ["C3", "B1"]
    # every Unicode string tokenizes — emoji (4-byte UTF-8) included
    assert byte_bpe_apply("\U0001F600") == ["F0", "9F", "98", "80"]


def test_byte_pretokenizer_cjk_per_codepoint():
    import re as _re

    from youbike_etl_pipeline_spark.operators.text import BYTE_PRETOKEN_RE

    assert _re.findall(BYTE_PRETOKEN_RE, "the 的是 cat") == [
        "the", "的", "是", "cat",
    ]
    # mixed-script run splits at the CJK boundary; case preserved
    assert _re.findall(BYTE_PRETOKEN_RE, "Ab的x") == ["Ab", "的", "x"]


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet="theinrandoü的是é ö",
        min_size=1,
        max_size=16,
    )
)
def test_byte_fixpoint_equivalence(word):
    """The hex-symbol recursive-CTE algorithm must equal byte-level BPE
    for every word over the merge table's byte alphabet — the t50
    equivalence matrix rerun over byte symbols (round-10 verdict)."""
    from youbike_etl_pipeline_spark.operators.text import (
        BYTE_BPE_MERGES,
        bpe_fixpoint_symbols,
        byte_bpe_apply,
    )

    syms = ["%02X" % b for b in word.encode("utf-8")]
    a = byte_bpe_apply(word)
    b = bpe_fixpoint_symbols(syms, BYTE_BPE_MERGES)
    assert a == b
    assert "".join(a) == "".join(syms)


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=150, deadline=None)
@given(
    st.binary(min_size=1, max_size=12),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=6,
    ),
)
def test_byte_fixpoint_equivalence_random_valid_tables(data, base_pairs):
    """Equivalence over RANDOM valid byte merge tables (incl. self-pair
    merges and operands built from earlier outputs) on raw octet
    sequences — no UTF-8 validity assumed, the byte-level property."""
    from youbike_etl_pipeline_spark.operators.text import (
        bpe_apply_symbols,
        bpe_fixpoint_symbols,
    )

    base = ["00", "01", "02", "03"]
    data = bytes(b % 4 for b in data)
    merges: list[tuple[str, str]] = []
    for i, (x, y) in enumerate(base_pairs):
        a, b = base[x], base[y]
        if merges and i % 2 == 1:
            a = merges[len(merges) // 2][0] + merges[len(merges) // 2][1]
        if (a, b) not in merges:
            merges.append((a, b))
    table = tuple(merges)
    syms = ["%02X" % b for b in data]
    assert bpe_apply_symbols(list(syms), table) == bpe_fixpoint_symbols(
        list(syms), table
    )


def test_byte_merge_table_invariant():
    """Every BYTE_BPE_MERGES operand is a base octet or the output of
    an EARLIER merge — the invariant the oracle equivalence rests on —
    and every symbol is uppercase even-length hex."""
    from youbike_etl_pipeline_spark.operators.text import BYTE_BPE_MERGES

    known = {"%02X" % i for i in range(256)}
    for a, b in BYTE_BPE_MERGES:
        assert a in known and b in known, (a, b)
        for s in (a, b):
            assert len(s) % 2 == 0 and s == s.upper()
            assert all(c in "0123456789ABCDEF" for c in s)
        known.add(a + b)


def test_duckdb_oracle_matches_python_byte_bpe():
    """The generated hex-symbol recursive CTE, run in DuckDB itself,
    must agree with the Python byte-level encoder on the augmented
    corpus text."""
    import re as _re

    import duckdb

    from youbike_etl_pipeline_spark.operators.text import (
        BYTE_PRETOKEN_RE,
        byte_bpe_apply,
    )
    from youbike_etl_pipeline_spark.plans.corpus import (
        _T53_AUG,
        _t53_byte_bpe_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    oracle = {
        r[0]: r[1:] for r in con.execute(_t53_byte_bpe_sql()).fetchall()
    }
    docs = con.execute(
        "SELECT doc_id, COALESCE(text,''), lang FROM documents"
    ).fetchall()
    aug = dict(_T53_AUG)
    checked = 0
    for did, text, lang in docs:
        t = text + aug.get(lang, "")
        words = _re.findall(BYTE_PRETOKEN_RE, t)
        if not words:
            assert did not in oracle
            continue
        checked += 1
        n_tok = sum(len(byte_bpe_apply(w)) for w in words)
        n_byt = sum(len(w.encode("utf-8")) for w in words)
        assert oracle[did][:3] == (len(words), n_tok, n_byt), did
    assert checked >= 5
