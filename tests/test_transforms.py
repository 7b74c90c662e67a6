"""Transform-contract tests mirroring the reference's suite
(``tests/test_etl.py`` — empty raises / missing columns raise / success), plus
property checks for tz normalization and dedup idempotence (SURVEY §5)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from youbike_etl_pipeline_spark.functions.scalar import to_utc_from_tz
from youbike_etl_pipeline_spark.sources.http import snapshot_to_df
from youbike_etl_pipeline_spark.sources.writers import append_dedup, upsert_insert_if_absent

FULL_RECORD = {
    "sno": "500101001",
    "sna": "YouBike2.0_測試站",
    "sarea": "中正區",
    "latitude": 25.04,
    "longitude": 121.52,
    "Quantity": 30,
    "available_rent_bikes": 5,
    "available_return_bikes": 25,
    "srcUpdateTime": "2025-12-10 15:00:00",
}


def test_transform_empty_raises(spark):
    with pytest.raises(ValueError):
        snapshot_to_df(spark, [])


def test_transform_missing_columns_raises(spark):
    with pytest.raises(KeyError):
        snapshot_to_df(spark, [{"sno": "1", "sna": "x"}])


def test_transform_success(spark):
    df = snapshot_to_df(spark, [FULL_RECORD])
    assert df.count() == 1
    assert df.columns == list(FULL_RECORD.keys())
    row = df.collect()[0]
    assert row["sno"] == "500101001"
    assert row["Quantity"] == 30


def test_tz_normalize_taipei_to_utc(spark):
    df = spark.createDataFrame([("2025-12-10 15:00:00",)], "ts_str string").select(
        to_utc_from_tz(F.to_timestamp("ts_str")).alias("utc")
    )
    assert df.collect()[0]["utc"] == datetime.datetime(2025, 12, 10, 7, 0, 0)


def test_append_dedup_idempotent(spark):
    batch = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 11), ("b", 2, 20)], "k string, t int, v int"
    )
    first = append_dedup(batch, None, ["k", "t"])
    assert first.count() == 2
    # re-running the same batch against what was loaded inserts nothing
    second = append_dedup(batch, first, ["k", "t"])
    assert second.count() == 0


def test_upsert_insert_if_absent(spark):
    incoming = spark.createDataFrame([("s1", "x"), ("s2", "y"), ("s2", "y2")], "station_no string, name string")
    existing = spark.createDataFrame([("s1",)], "station_no string")
    new = upsert_insert_if_absent(incoming, existing, "station_no")
    rows = new.collect()
    assert len(rows) == 1 and rows[0]["station_no"] == "s2"


def test_rename_synonyms_guarded(spark):
    from youbike_etl_pipeline_spark.operators.relational import rename_synonyms

    df = spark.createDataFrame([("x", "y", 1)], "sno string, StationUID string, v int")
    out = rename_synonyms(df)
    # first synonym wins; second is left alone to avoid duplicate targets
    assert out.columns == ["station_no", "StationUID", "v"]


def test_coerce_numeric_invalid_to_null(spark):
    from youbike_etl_pipeline_spark.operators.relational import coerce_numeric

    df = spark.createDataFrame([("1.5",), ("oops",), (None,)], "x string")
    vals = [r["x"] for r in coerce_numeric(df, ["x"]).collect()]
    assert vals == [1.5, None, None]


def test_dedup_by_key_deterministic_survivor(spark):
    from youbike_etl_pipeline_spark.operators.relational import dedup_by_key

    df = spark.createDataFrame(
        [("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b")], "key string, ord int, v string"
    )
    out = dedup_by_key(df, ["key"], order_by=["ord"]).collect()
    assert len(out) == 1 and out[0]["v"] == "a"


def test_stream_reader_tolerates_directory_layout(spark, tmp_path):
    """The stream readers must read a table shipped as BOTH a single
    `events.parquet` file in the sf dir (driver testdata) and an
    `events.parquet/part-*.parquet` directory (any real warehouse) — the
    old leaf-filename glob silently read ZERO files from the directory
    layout (caught when the 1000x probe 'processed' 100M events in 0.3s)."""
    import os

    from pyspark.sql import functions as F

    from youbike_etl_pipeline_spark.sources.readers import read_events
    from youbike_etl_pipeline_spark.streaming.ingest import read_events_stream

    src = read_events(spark, "/root/testdata/sf0.001").limit(500)
    d = str(tmp_path / "sfdir")
    os.makedirs(d, exist_ok=True)
    src.repartition(3).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    stream = read_events_stream(spark, d)
    name = "t_dirlayout"
    q = (
        stream.groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table(name).first()["n"]
    finally:
        q.stop()
    assert got == 500
