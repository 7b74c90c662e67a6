"""Python UDTF surface tests (functions/udtf.py).

The UDTF path must agree exactly with the Catalyst production path
(chunk_spans' sequence+posexplode) so the two implementations cannot
drift, and the lateral-join registration must work end to end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youbike_etl_pipeline_spark.functions.udtf import ChunkText, JsonKVExplode
from youbike_etl_pipeline_spark.operators.text import chunk_spans


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)


def test_chunk_udtf_matches_explode_path(spark, docs):
    """UDTF chunking == the codegen sequence+posexplode chunking on the
    same (window, stride) — identical (doc_id, chunk_idx, start_tok)."""
    spark.udtf.register("chunk_text_t", ChunkText)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.start_tok "
        "FROM udtf_docs d, LATERAL chunk_text_t(d.text, 5, 3) c"
    )
    via_explode = chunk_spans(docs, window=5, stride=3).select(
        "doc_id", "chunk_idx", "start_tok"
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_explode.collect()))
    assert a == b and len(a) > 0


def test_chunk_udtf_edge_cases(spark):
    spark.udtf.register("chunk_text_e", ChunkText)
    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, ""), (2, None), (3, "   "), (4, "one")],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("udtf_edge")
    out = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk "
        "FROM udtf_edge d, LATERAL chunk_text_e(d.text, 3, 2) c"
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    # 7 tokens, window 3 stride 2 -> starts 0,2,4 cover to 7: last chunk at 4
    assert by_doc[0] == [(0, "a b c"), (1, "c d e"), (2, "e f g")]
    assert 1 not in by_doc and 2 not in by_doc and 3 not in by_doc
    assert by_doc[4] == [(0, "one")]


def test_json_kv_udtf_matches_variant_path(spark, sf_small):
    """JsonKVExplode's k values == the VARIANT extraction on real props."""
    ev = spark.read.parquet(f"{sf_small}/events.parquet").limit(200)
    spark.udtf.register("json_kv_t", JsonKVExplode)
    ev.createOrReplaceTempView("udtf_events")
    via_udtf = spark.sql(
        "SELECT e.event_id, c.value_int FROM udtf_events e, "
        "LATERAL json_kv_t(e.props) c WHERE c.key = 'k'"
    )
    via_variant = ev.select(
        "event_id",
        F.try_variant_get(F.try_parse_json("props"), "$.k", "int").alias("value_int"),
    ).filter(F.col("value_int").isNotNull())
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_variant.collect()))
    assert a == b and len(a) > 0


def test_json_kv_udtf_malformed_yields_no_rows(spark):
    spark.udtf.register("json_kv_m", JsonKVExplode)
    df = spark.createDataFrame(
        [(0, "not json"), (1, None), (2, "[1,2]"), (3, '{"a": 1, "b": 2}')],
        "i int, props string",
    )
    df.createOrReplaceTempView("udtf_bad")
    out = spark.sql(
        "SELECT d.i, c.key, c.value_int FROM udtf_bad d, LATERAL json_kv_m(d.props) c"
    ).collect()
    assert sorted(map(tuple, out)) == [(3, "a", 1), (3, "b", 2)]
