"""Crawl HTML→text extraction (round 9): the from-scratch extractor
(operators/html.py) against the four extraction-invariant fixture
variants, adversarial markup shapes, entity round-trips (hypothesis),
and the end-to-end WARC-wrapped Spark path mm29 grades."""

from __future__ import annotations

import hashlib

import pytest

from youbike_etl_pipeline_spark.operators.html import (
    build_fixture_html,
    decode_entities,
    escape_html,
    expected_extraction,
    extract_html_text,
    normalize_text_ws,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


TEXTS = [
    "hello world",
    "",
    "multi\nline  text\twith <tags> & &amp; entities",
    "  leading and trailing  ",
    "&#x41; literal & <p>nested</p> &lt;escaped&gt;",
    "unicode — 中文 café\n\n\nblank lines",
    "a\rb\fc\vd horizontal controls",
    "quotes \" and ' survive",
]


def test_variant_matrix_extraction_invariant():
    """All four markup variants of the same document must extract to the
    identical (title, text, links) — the mm25 variant-matrix discipline
    applied to markup."""
    for i, txt in enumerate(TEXTS):
        for v in range(4):
            did = v * 10 + i * 40
            got = extract_html_text(build_fixture_html(did, txt))
            assert got == expected_extraction(did, txt), (did, v, txt)


def test_script_style_comment_head_never_leak():
    html = (
        "<html><head><title>T</title>"
        "<style>p { content: 'styleword'; }</style>"
        "<script>var x = 'scriptword <p>fake</p>';</script></head>"
        "<body><!-- commentword --><p>real</p>"
        "<SCRIPT>inline 'bodyscriptword'</SCRIPT>"
        "<p>tail</p></body></html>"
    )
    ex = extract_html_text(html)
    assert ex["title"] == "T"
    assert ex["text"] == "real\ntail"
    for leak in ("styleword", "scriptword", "commentword", "bodyscriptword", "T"):
        assert leak not in ex["text"]


def test_block_vs_inline_tag_semantics():
    ex = extract_html_text(
        "<body><p>one<b>two</b>three</p><div>four</div>five<br>six</body>"
    )
    # inline <b> glues, block tags separate
    assert ex["text"] == "onetwothree\nfour\nfive\nsix"


def test_entity_decoding_order_and_numerics():
    assert decode_entities("&amp;lt;") == "&lt;"
    assert decode_entities("&#65;&#x42;&#x63;") == "ABc"
    assert decode_entities("&lt;p&gt; &quot;q&quot; &apos;a&apos; &nbsp;") == (
        "<p> \"q\" 'a'  "
    )
    # escape/decode are inverses on arbitrary text
    for t in TEXTS:
        assert decode_entities(escape_html(t)) == t


def test_headless_and_unclosed_documents():
    # no <body>: content still extracted, title text never leaks
    ex = extract_html_text("<html><head><title>T</title></head><p>x</p></html>")
    assert ex == {"title": "T", "text": "x", "links": []}
    # no html/head/body at all
    ex = extract_html_text("<p>just a fragment</p>")
    assert ex == {"title": "", "text": "just a fragment", "links": []}
    # unterminated body (truncated crawl payload): regex falls back to EOF
    ex = extract_html_text("<body><p>cut off mid-docu")
    assert ex["text"] == "cut off mid-docu"


def test_href_extraction_quoting_and_scope():
    ex = extract_html_text(
        "<body><a href=\"http://a/1\">x</a>"
        "<a class='k' href='http://a/2'>y</a>"
        "<a name=anchor>no href</a></body>"
    )
    assert ex["links"] == ["http://a/1", "http://a/2"]
    # links inside removed regions don't count
    ex = extract_html_text(
        "<head><script>s='<a href=\"http://fake/\">';</script></head>"
        "<body><!-- <a href=\"http://fake2/\">c</a> -->"
        "<a href=\"http://real/\">r</a></body>"
    )
    assert ex["links"] == ["http://real/"]


def test_normalize_text_ws_chain():
    assert normalize_text_ws("  a \t b \r\n\n  c  \n\n") == "a b\nc"
    assert normalize_text_ws("\n\n\n") == ""
    assert normalize_text_ws("x") == "x"


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000).map(lambda i: i * 10),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        max_size=400,
    ),
)
def test_fixture_roundtrip_property(did, txt):
    """Any text (markup-looking, entity-looking, control chars, unicode)
    must survive escape → template → extract identically to the oracle's
    raw-text assembly, for every variant."""
    want = expected_extraction(did, txt)
    for v in range(4):
        got = extract_html_text(build_fixture_html(did + v * 10, txt))
        want_v = expected_extraction(did + v * 10, txt)
        assert got["text"] == want_v["text"]
        assert got["title"] == want_v["title"]
        assert got["links"] == want_v["links"]
    assert want["links"][0].endswith(str(did - 10))


@pytest.mark.usefixtures("spark")
def test_mm29_end_to_end_spark(spark):
    """The full mm29 path: documents → HTML fixture → WARC archive →
    parse → HTTP split → extract — hash parity is graded by the driver;
    here pin the per-row contract on sf0.001."""
    from youbike_etl_pipeline_spark.plans.corpus import CORPUS

    df = CORPUS["mm29_html_text_extract"].fn(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) >= 5
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    docs = dict(
        con.execute(
            "SELECT doc_id, COALESCE(text,'') FROM documents WHERE doc_id%10=0"
        ).fetchall()
    )
    assert set(rows) == set(docs)
    for did, text in docs.items():
        want = expected_extraction(int(did), text)
        r = rows[did]
        assert r["title"] == want["title"]
        assert r["n_links"] == 2
        assert r["first_link"] == want["links"][0]
        assert r["text_chars"] == len(want["text"])
        assert r["text_md5"] == hashlib.md5(want["text"].encode()).hexdigest()


def test_mm31_quality_chain_duckdb_vs_python():
    """The chained CCNet oracle (expected-extraction CTE → t6 quality
    mirrors) must equal a direct Python computation of the same quality
    formula over the extractor's own output — pure DuckDB + Python, no
    Spark, so the chain identity is pinned independently of the driver."""
    import re

    import duckdb

    from youbike_etl_pipeline_spark.plans.corpus import _mm31_crawl_quality_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    oracle = {r[0]: r[1:] for r in con.execute(_mm31_crawl_quality_sql()).fetchall()}
    docs = con.execute(
        "SELECT doc_id, COALESCE(text,'') FROM documents WHERE doc_id % 10 = 0"
    ).fetchall()
    assert set(oracle) == {d for d, _ in docs}
    stops = ["the", "and", "of", "to", "a"]
    for did, text in docs:
        xt = extract_html_text(build_fixture_html(int(did), text))["text"]
        toks = [t for t in re.split(r"\s+", xt.strip()) if t]
        n_tokens, n_chars = len(toks), len(xt)
        n_punct = len(re.findall(r"[^\w\s]", xt))
        low = re.split(r"[^a-z]+", xt.lower())
        n_stop = sum(low.count(w) for w in stops)
        lt = min(n_tokens / 100.0, 1.0)
        pt = 1.0 - min((n_punct / n_chars if n_chars else 0.0) * 5.0, 1.0)
        st = min((n_stop / n_tokens if n_tokens else 0.0) * 4.0, 1.0)
        q = (lt + pt + st) / 3.0
        got = oracle[did]
        assert got[:2] == (n_tokens, n_chars), did
        # oracle emits ROUND(quality, 6); compare within half an ulp of
        # that precision (the DRIVER compares Spark vs DuckDB, both
        # rounding the same IEEE double — this test only pins the chain)
        assert abs(got[2] - q) <= 5e-7, did
        assert got[3] == (q >= 0.5), did


def test_charset_transfer_decoding(spark):
    """mm32's path: pages served as UTF-8 / UTF-16(LE+BOM) / ISO-8859-1
    with the charset declared in the HTTP header must extract to the
    SAME text (transfer-encoding invariance), and the charset resolver
    must honor header > BOM > default."""
    from youbike_etl_pipeline_spark.operators.multimodal import (
        attach_html_warc_payloads,
        extract_html_features,
    )
    from youbike_etl_pipeline_spark.operators.warc import (
        http_charset,
        http_response_message,
        parse_warc,
        warc_type,
    )

    rows = [
        (0, "utf-8 page with unicode — 中文"),   # r0: utf-8
        (10, "utf-16 page with café accents"),    # r1: utf-16 LE + BOM
        (20, "latin-1 encodable café page"), # r2: iso-8859-1
        (50, "r2 but NOT latin-1 encodable 中文"),# r2 fallback: utf-8
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = {
        r["doc_id"]: r
        for r in extract_html_features(
            attach_html_warc_payloads(df, charset_rotation=True),
            honor_charset=True,
        ).collect()
    }
    for did, text in rows:
        want = expected_extraction(did, text)
        assert feats[did]["title"] == want["title"]
        assert feats[did]["text_chars"] == len(want["text"])
        assert feats[did]["text_md5"] == hashlib.md5(
            want["text"].encode()
        ).hexdigest()
    # header charsets actually differ per rotation slot
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in attach_html_warc_payloads(df, charset_rotation=True).collect()
    }
    seen = {}
    for did, _ in rows:
        recs = parse_warc(payloads[did])
        resp = [r for r in recs if warc_type(r) == "response"][0]
        _, headers, body = http_response_message(resp)
        seen[did] = http_charset(headers, body)
    assert seen == {0: "utf-8", 10: "utf-16", 20: "iso-8859-1", 50: "utf-8"}
    # BOM fallback when the header has no charset parameter
    assert http_charset({"content-type": "text/html"}, b"\xff\xfethe") == "utf-16"
    assert http_charset({}, b"\xef\xbb\xbfrest") == "utf-8-sig"
    assert http_charset({}, b"plain") == "utf-8"
    # header wins over BOM
    assert (
        http_charset({"content-type": 'text/html; charset="ISO-8859-1"'}, b"\xff\xfe")
        == "iso-8859-1"
    )


# ----------------------------------------------- round 10: boilerplate


def test_main_text_noise_variant_invariant():
    """All four noise shapes keep exactly the three content blocks and
    drop the variant's boilerplate count — the extraction-invariant
    discipline applied to main-content detection."""
    from youbike_etl_pipeline_spark.operators.html import (
        BOILERPLATE_DROPPED,
        build_boilerplate_html,
        expected_main_text,
        extract_main_text,
    )

    text = "stream batch join customer order " * 4
    for did in (0, 10, 20, 30):
        v = (did // 10) % 4
        r = extract_main_text(build_boilerplate_html(did, text.strip()))
        assert r["text"] == expected_main_text(did, text.strip()), did
        assert r["n_dropped"] == BOILERPLATE_DROPPED[v], did
        assert r["n_blocks"] == 3 + BOILERPLATE_DROPPED[v], did


def test_main_text_density_not_presence():
    """A short link inside long text survives (density <= 1/3); a
    link-dominated block does not; exactly-threshold blocks survive
    (strict inequality)."""
    from youbike_etl_pipeline_spark.operators.html import extract_main_text

    keep = "<html><body><p>aaaa <a href='/x'>b</a> cccc dddd</p></body></html>"
    r = extract_main_text(keep)
    assert r == {"text": "aaaa b cccc dddd", "n_blocks": 1, "n_dropped": 0}
    drop = "<html><body><p><a href='/x'>only a link</a></p></body></html>"
    r = extract_main_text(drop)
    assert r == {"text": "", "n_blocks": 1, "n_dropped": 1}
    # exactly 1/3: len(text)=9, link=3 -> 3*3 > 9 is False -> kept
    edge = "<html><body><p>ab <a href='/x'>cde</a> fgh</p></body></html>"
    r = extract_main_text(edge)
    assert r["n_dropped"] == 0 and r["text"] == "ab cde fgh"


def test_main_text_empty_article_and_noise_only():
    from youbike_etl_pipeline_spark.operators.html import (
        BOILERPLATE_DROPPED,
        build_boilerplate_html,
        expected_main_text,
        extract_main_text,
    )

    r = extract_main_text(build_boilerplate_html(0, ""))
    assert r["text"] == expected_main_text(0, "")
    assert r["n_blocks"] == 2 + BOILERPLATE_DROPPED[0]
    # a page of pure navigation keeps nothing
    nav = (
        "<html><body><nav><a href='/'>Home</a> <a href='/a'>A</a></nav>"
        "</body></html>"
    )
    assert extract_main_text(nav) == {
        "text": "",
        "n_blocks": 1,
        "n_dropped": 1,
    }


def test_main_text_script_comments_and_entities():
    """The preprocessing contract is extract_html_text's: script/style/
    comment/head content never leaks into block text or link chars, and
    entities decode before densities are measured."""
    from youbike_etl_pipeline_spark.operators.html import extract_main_text

    html = (
        "<html><head><title>T</title>"
        "<script>var a = '<a href=x>fake</a>';</script></head><body>"
        "<!-- <a href='/y'>ghost link</a> -->"
        "<p>caf&eacute;? &#65;lpha &amp; beta gamma delta "
        "<a href='/z'>go</a></p>"
        "</body></html>"
    )
    r = extract_main_text(html)
    assert r["n_blocks"] == 1 and r["n_dropped"] == 0
    assert "fake" not in r["text"] and "ghost" not in r["text"]
    assert "Alpha & beta" in r["text"]


def test_mm35_end_to_end_spark(spark):
    from youbike_etl_pipeline_spark.operators.html import (
        BOILERPLATE_DROPPED,
        expected_main_text,
    )
    from youbike_etl_pipeline_spark.operators.multimodal import (
        attach_boilerplate_warc_payloads,
        extract_main_text_features,
    )
    import hashlib

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (10, "delta words"), (20, ""), (30, "x y")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in extract_main_text_features(
            attach_boilerplate_warc_payloads(df)
        ).collect()
    }
    for did, text in ((0, "alpha beta gamma"), (10, "delta words"), (30, "x y")):
        exp = expected_main_text(did, text)
        assert rows[did]["kept_md5"] == hashlib.md5(exp.encode()).hexdigest()
        assert rows[did]["kept_chars"] == len(exp)
        v = (did // 10) % 4
        assert rows[did]["n_dropped"] == BOILERPLATE_DROPPED[v]
        assert rows[did]["n_blocks"] == 3 + BOILERPLATE_DROPPED[v]
    assert rows[20]["n_blocks"] == 2 + BOILERPLATE_DROPPED[2]
