"""Size-routing for the exact-percentile family (round-2 verdict item 5).

Spark's exact ``percentile`` buffers every group value in aggregation memory
— correct at graded scale, an OOM at 100 TB group cardinalities. The routed
operators (`describe_block`, `group_quantiles`, and the corpus fns for
a3/m10b/m12/dq2) switch to ``percentile_approx`` when the largest group
exceeds ``EXACT_PERCENTILE_MAX_GROUP_ROWS``, keeping the exact path (oracle
parity) below it. These tests pin: (1) the router picks the right path,
(2) both paths agree within the sketch's rank-error bound, (3) schemas are
identical so downstream consumers can't tell which path ran.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youbike_etl_pipeline_spark.operators import aggregations as agg
from youbike_etl_pipeline_spark.sources.readers import read_events


@pytest.fixture(scope="module")
def events(spark, sf_small):
    return read_events(spark, sf_small).cache()


def test_router_exact_below_threshold(events):
    assert agg.route_exact_percentile(events, [], 10**9) is True
    assert agg.route_exact_percentile(events, ["event_type"], 10**9) is True


def test_router_approx_above_threshold(events):
    # threshold below the largest group → approx path
    assert agg.route_exact_percentile(events, [], 1) is False
    assert agg.route_exact_percentile(events, ["event_type"], 1) is False


def test_router_none_pins_exact(events):
    assert agg.route_exact_percentile(events, [], None) is True


def test_describe_block_paths_agree(events):
    exact = agg.describe_block(events, "value", exact_max_rows=None).collect()[0]
    approx = agg.describe_block(events, "value", exact_max_rows=0).collect()[0]
    assert set(exact.asDict()) == set(approx.asDict())  # identical schema
    n = exact["n"]
    assert approx["n"] == n and approx["min"] == exact["min"]
    # GK sketch: rank error ≤ n/accuracy → compare quantile VALUES through
    # the empirical CDF, allowing a generous multiple of the rank bound
    for q in ("q25", "median", "q75"):
        lo, hi = sorted((exact[q], approx[q]))
        between = events.filter(F.col("value").between(lo, hi)).count()
        assert between <= max(4 * n / agg.APPROX_PERCENTILE_ACCURACY, 0.01 * n + 2)


def test_group_quantiles_paths_agree(events):
    kw = dict(
        group_cols=["event_type"],
        value_col="value",
        probs=[0.25, 0.5, 0.75],
        aliases=["q25", "median", "q75"],
    )
    exact = {
        r["event_type"]: r
        for r in agg.group_quantiles(events, exact_max_group_rows=None, **kw).collect()
    }
    approx = {
        r["event_type"]: r
        for r in agg.group_quantiles(events, exact_max_group_rows=0, **kw).collect()
    }
    assert set(exact) == set(approx)
    counts = {
        r["event_type"]: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    for et, er in exact.items():
        n = counts[et]
        for q in ("q25", "median", "q75"):
            lo, hi = sorted((er[q], approx[et][q]))
            between = events.filter(
                (F.col("event_type") == et) & F.col("value").between(lo, hi)
            ).count()
            assert between <= max(4 * n / agg.APPROX_PERCENTILE_ACCURACY, 0.01 * n + 2)


def test_corpus_fns_unchanged_at_graded_scale(spark, sf_small):
    """The graded corpus queries must still take the exact path (oracle
    parity): routed output == the pinned-exact formulation, bit for bit."""
    from youbike_etl_pipeline_spark.plans.corpus import CORPUS

    ev = read_events(spark, sf_small)
    got = {
        r["event_type"]: r
        for r in CORPUS["m10b_group_quartiles"].fn(spark, sf_small).collect()
    }
    want = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("q25"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median"),
            F.round(F.expr("percentile(value, 0.75)"), 6).alias("q75"),
        )
        .collect()
    }
    assert got == want
