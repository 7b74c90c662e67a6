"""Incremental rollup maintenance: merging micro-batch partials must equal
the from-scratch batch aggregation, for any batch slicing."""

from __future__ import annotations

from pyspark.sql import functions as F

from youbike_etl_pipeline_spark.sources.readers import read_events
from youbike_etl_pipeline_spark.streaming.rollup import IncrementalRollup


def test_incremental_rollup_equals_batch(spark, sf_small):
    ev = read_events(spark, sf_small).withColumn(
        "hour_key", F.date_trunc("hour", "ts")
    )
    rollup = IncrementalRollup(keys=["event_type"], value_col="value")
    # three uneven micro-batches by event_id ranges
    for lo, hi in [(0, 300), (300, 301), (301, 10**9)]:
        rollup.update(ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)))
    got = {
        r["event_type"]: (r["n"], round(r["sum"], 6), r["min"], r["max"])
        for r in rollup.finalize().collect()
    }
    expected = {
        r["event_type"]: (r["n"], round(r["sum"], 6), r["min"], r["max"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .collect()
    }
    assert got == expected


def test_rollup_empty_batch_is_noop(spark, sf_small):
    ev = read_events(spark, sf_small)
    rollup = IncrementalRollup(keys=["event_type"], value_col="value")
    rollup.update(ev)
    before = sorted(map(tuple, rollup.finalize().collect()))
    rollup.update(ev.filter(F.lit(False)))  # empty micro-batch
    after = sorted(map(tuple, rollup.finalize().collect()))
    assert before == after
