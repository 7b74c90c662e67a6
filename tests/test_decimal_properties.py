"""Property-based cross-engine tests for the float-parity helpers.

Every oracle hash-match in this repo rests on ``decimal_sum`` /
``decimal_avg_q4`` / ``q6`` producing bit-identical doubles in Spark and
DuckDB. Hypothesis drives the helpers with adversarial inputs — 2-decimal
money, dyadic quotients (exact ....5 expansions at arbitrary scale), values
hugging quantization boundaries — and asserts exact equality against the
mirrored SQL fragments on the same data.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from youbike_etl_pipeline_spark.operators.aggregations import (
    decimal_avg_q4,
    decimal_sum,
)
from youbike_etl_pipeline_spark.plans.corpus import SQL_DAVG_Q4, SQL_DSUM, SQL_Q6, q6

# 2-decimal money values (the driver generator's shape)
money = st.integers(min_value=-50_000_000, max_value=50_000_000).map(
    lambda c: c / 100.0
)
# dyadic quotients: p/2^k has an exact decimal expansion ending in ...5 —
# the documented tie trap for any rounding-based quantization
dyadic = st.tuples(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=0, max_value=20),
).map(lambda t: t[0] / (1 << t[1]))

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _duck_scalar(values: list[float], sql_expr: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE v (x DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?)", [(v,) for v in values])
    return con.execute(f"SELECT {sql_expr.replace('COL', 'x')} FROM v").fetchone()[0]


@SLOW
@given(st.lists(money, min_size=1, max_size=300))
def test_decimal_sum_matches_duckdb(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double").repartition(4)
    got = df.agg(decimal_sum("x").alias("s")).collect()[0]["s"]
    want = _duck_scalar(values, SQL_DSUM("COL"))
    assert got == want


@SLOW
@given(st.lists(st.one_of(money, dyadic), min_size=1, max_size=300))
def test_decimal_avg_q4_matches_duckdb(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double").repartition(4)
    got = df.agg(decimal_avg_q4("x").alias("m")).collect()[0]["m"]
    want = _duck_scalar(values, SQL_DAVG_Q4("COL"))
    assert got == want


@SLOW
@given(st.lists(st.one_of(money, dyadic), min_size=1, max_size=200))
def test_q6_quantization_matches_duckdb(spark, values):
    # q6 floors per value — compare element-wise
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i long, x double"
    )
    got = {r["i"]: r["q"] for r in df.select("i", q6(df.x).alias("q")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE v (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?, ?)", list(enumerate(values)))
    want = dict(con.execute(f"SELECT i, {SQL_Q6('x')} FROM v").fetchall())
    assert got == pytest.approx(want, abs=0.0)


@SLOW
@given(st.lists(money, min_size=2, max_size=200))
def test_decimal_sum_partition_invariant(spark, values):
    """The same values summed under 1 vs 7 partitions give identical bits."""
    df1 = spark.createDataFrame([(v,) for v in values], "x double").coalesce(1)
    df7 = spark.createDataFrame([(v,) for v in values], "x double").repartition(7)
    s1 = df1.agg(decimal_sum("x").alias("s")).collect()[0]["s"]
    s7 = df7.agg(decimal_sum("x").alias("s")).collect()[0]["s"]
    assert s1 == s7
