"""Pandas-API-on-Spark migration path (SURVEY §1: the reference is pandas).

A reference user's notebook code (`pivot_table`, `groupby().agg`,
`value_counts`) runs on Spark via `pyspark.pandas` with the imports
changed — these tests pin the ps results equal to the engine's native
DataFrame operators so the migration path provably lands on the same
answers. (`ps` compiles to the same Catalyst plans; it is a front-end,
not a second engine.)
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ps(spark):
    pyspark_pandas = pytest.importorskip("pyspark.pandas")
    return pyspark_pandas


def test_pivot_table_matches_native_pivot(spark, ps, sf_small):
    """The reference's station-profile pattern:
    pivot_table(index=..., columns='hour', values=..., aggfunc='mean')
    (notebooks/01_youbike_analysis.ipynb:L659) — ps vs native pivot."""
    pdf = ps.read_parquet(f"{sf_small}/events.parquet")
    pdf = pdf.assign(hour=pdf["ts"].dt.hour)
    via_ps = pdf.pivot_table(
        index=["user_id"], columns="hour", values="value", aggfunc="mean"
    )

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    native = (
        ev.withColumn("hour", F.hour("ts"))
        .groupBy("user_id")
        .pivot("hour", list(range(24)))
        .agg(F.avg("value"))
    )

    ps_rows = {
        int(idx): {int(c): v for c, v in row.items() if v == v}
        for idx, row in via_ps.to_pandas().iterrows()
    }
    for r in native.collect():
        want = ps_rows[r["user_id"]]
        for h in range(24):
            got = r[str(h)]
            if got is None:
                assert h not in want
            else:
                assert abs(got - want[h]) < 1e-9


def test_groupby_agg_matches_native(spark, ps, sf_small):
    pdf = ps.read_parquet(f"{sf_small}/orders.parquet")
    grouped = pdf.groupby("o_orderpriority")["o_totalprice"]
    # SeriesGroupBy.agg([...]) is not implemented in this pyspark.pandas;
    # the single-stat methods compile to the same hash aggregates
    via_ps = (
        grouped.count().to_frame("count").join(grouped.max().to_frame("max"))
        .to_pandas()
        .sort_index()
    )
    native = {
        r["o_orderpriority"]: (r["n"], r["mx"])
        for r in spark.read.parquet(f"{sf_small}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.max("o_totalprice").alias("mx"))
        .collect()
    }
    for prio, row in via_ps.iterrows():
        assert (int(row["count"]), float(row["max"])) == (
            native[prio][0],
            pytest.approx(native[prio][1]),
        )


def test_value_counts_matches_native(spark, ps, sf_small):
    pdf = ps.read_parquet(f"{sf_small}/events.parquet")
    via_ps = pdf["event_type"].value_counts().to_pandas().to_dict()
    native = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_small}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert via_ps == native
