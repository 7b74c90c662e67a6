"""The named-query corpus: one entry per implemented SURVEY §2 operator.

Each :class:`QuerySpec` pairs a Spark implementation (built on the operator
library) with a DuckDB-runnable ANSI-SQL oracle over the same parquet tables.
The driver cross-checks row count + schema + order-insensitive value hash at
sf=0.01; ``tests/test_parity.py`` runs the same check locally at sf=0.001.

Float determinism discipline (so Spark and DuckDB hash-match exactly):

- Sums of doubles go through :func:`~..operators.aggregations.decimal_sum`
  (cast to decimal → exact associative sum → back to double). Plain double
  sums are partition-order dependent and would differ run to run.
- Means use :func:`~..operators.aggregations.decimal_avg` (exact sum, one
  double division).
- Variance-family stats (stddev/skew) are rounded to 6 decimals on both
  sides; their cross-engine drift is ~1e-12 relative.
- Window orderings always carry a unique tie-break column.
- Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import aggregations as agg
from ..operators import joins as oj
from ..operators import relational as rel
from ..operators import windows as ow
from ..sources.readers import read_events, read_parquet_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check
    survey_rows: str = ""  # SURVEY §2 rows this query exercises
    description: str = ""


CORPUS: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, survey_rows: str = "", description: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        CORPUS[name] = QuerySpec(name, fn, oracle, survey_rows, description)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in CORPUS.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CORPUS.items() if spec.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return read_parquet_table(spark, sf_dir, name)


# SQL fragment mirrors of the decimal-sum/avg discipline.
def SQL_DSUM(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"


def SQL_DAVG(expr: str, scale: int = 6) -> str:
    return f"{SQL_DSUM(expr, scale)} / COUNT({expr})"


# ===========================================================================
# Flagship — the reference's "district operational health" query (SURVEY §7)
# mapped onto the driver star schema: lineitem⋈orders⋈customer →
# groupBy(c_mktsegment) 6-metric stats block (A1-A4 + A2 CV + F3 ratio).
# Reference semantics: notebooks/01_youbike_analysis.ipynb:L64-L72,L274,
# L280-L295,L310-L312.
# ===========================================================================


@register(
    "flagship_segment_health",
    f"""
    SELECT c.c_mktsegment,
           {SQL_DAVG('l.l_discount')} AS mean_disc,
           ROUND(STDDEV_SAMP(l.l_discount), 6) AS std_disc,
           COUNT(l.l_discount) AS n,
           AVG(CASE WHEN l.l_discount < 0.02 THEN 1.0 ELSE 0.0 END) AS shortage_rate,
           AVG(CASE WHEN l.l_discount > 0.08 THEN 1.0 ELSE 0.0 END) AS full_rate,
           ROUND(STDDEV_SAMP(l.l_discount) / ({SQL_DAVG('l.l_discount')}), 6) AS cv
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey_rows="A1,A2,A4,J1,F3",
    description="6-metric group-health block: mean/std/count + conditional "
    "rates + CV per market segment (reference notebook 01 Part A).",
)
def flagship_segment_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    d = F.col("l_discount")
    out = joined.groupBy("c_mktsegment").agg(
        agg.decimal_avg(d).alias("mean_disc"),
        F.round(F.stddev_samp(d), 6).alias("std_disc"),
        F.count(d).alias("n"),
        F.avg(F.when(d < 0.02, 1.0).otherwise(0.0)).alias("shortage_rate"),
        F.avg(F.when(d > 0.08, 1.0).otherwise(0.0)).alias("full_rate"),
        F.round(F.stddev_samp(d) / agg.decimal_avg(d), 6).alias("cv"),
    )
    return out


# ===========================================================================
# §2.2 Projections / filters
# ===========================================================================


@register(
    "p1_p2_project_rename",
    """
    SELECT l_orderkey AS order_key, l_linenumber AS line_no,
           l_quantity AS qty, l_returnflag AS flag
    FROM lineitem WHERE l_orderkey % 97 = 0
    """,
    survey_rows="P1,P2",
    description="Column projection + rename with a pushed-down filter.",
)
def p1_p2_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    return rel.project(li, ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]).toDF(
        "order_key", "line_no", "qty", "flag"
    )


@register(
    "p4_dedup_by_key",
    """
    SELECT user_id, COUNT(*) AS n_combos
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY user_id
    """,
    survey_rows="P4,S8",
    description="Dedup on a business key then per-key count (idempotent-load core).",
)
def p4_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        rel.dedup_by_key(ev.select("user_id", "event_type"), ["user_id", "event_type"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_combos"))
    )


@register(
    "p5_distinct_pairs",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    survey_rows="P5",
    description="Distinct pair projection.",
)
def p5_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rel.distinct_pairs(_t(spark, sf_dir, "customer"), ["c_mktsegment", "c_nationkey"])


@register(
    "p6_filter_predicates",
    f"""
    SELECT l_returnflag, COUNT(*) AS n, {SQL_DSUM('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_returnflag IN ('A', 'R')
      AND l_quantity <= 30
    GROUP BY l_returnflag
    """,
    survey_rows="P6",
    description="Boolean-mask filters: range + isin + bound, all pushed down.",
)
def p6_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") <= 30)
    )
    return filtered.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), agg.decimal_sum("l_extendedprice").alias("sum_price")
    )


@register(
    "p9_null_fill_coalesce",
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN event_type = 'error' THEN NULL ELSE value END) AS n_obs
    FROM events GROUP BY event_type
    """,
    survey_rows="P6,P8,P9,F15",
    description="Null introduction + null-count accounting (fillna/isnull path).",
)
def p9_null_fill_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "masked", F.when(F.col("event_type") != "error", F.col("value"))
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("masked").alias("n_obs"),
    )


@register(
    "p12_try_cast_json",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    survey_rows="P12,F11",
    description="JSON field extraction + numeric coercion (get_json_object/try_cast).",
)
def p12_try_cast_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.withColumn("k_mod", k % 10).groupBy("k_mod").agg(F.count(F.lit(1)).alias("n"))


# ===========================================================================
# §2.3 Joins
# ===========================================================================


@register(
    "j1_fact_dim_revenue",
    f"""
    SELECT r.r_name, n.n_name,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    survey_rows="J1,F3",
    description="Fact ⋈ broadcast-dimension chain → revenue rollup by region/nation.",
)
def j1_fact_dim_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("r_name", "n_name").agg(
        agg.decimal_sum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


@register(
    "j2_hour_bucket_join",
    f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour_key, {SQL_DAVG('value')} AS hourly_avg
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           {SQL_DAVG('ABS(e.value - h.hourly_avg)')} AS mean_abs_dev
    FROM events e
    JOIN hourly h ON date_trunc('hour', e.ts) = h.hour_key
    GROUP BY e.event_type
    """,
    survey_rows="J2,W4",
    description="Hour-floor time-bucket join (weather-join shape): each event "
    "joins its containing hour's aggregate.",
)
def j2_hour_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_key")).agg(
        agg.decimal_avg("value").alias("hourly_avg")
    )
    joined = oj.hour_bucket_join(ev, hourly, fact_ts="ts", hourly_ts="hour_key", how="inner")
    dev = F.abs(F.col("value") - F.col("hourly_avg"))
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), agg.decimal_avg(dev).alias("mean_abs_dev")
    )


@register(
    "j4_anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_nationkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_rows="J4,S9,P7",
    description="Left-anti join: the insert-if-absent upsert shape.",
)
def j4_anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    new = oj.anti_join_new_rows(
        cust.withColumnRenamed("c_custkey", "o_custkey"), orders, on="o_custkey"
    )
    return new.select(F.col("o_custkey").alias("c_custkey"), "c_nationkey")


@register(
    "j4b_semi_join_active_customers",
    """
    SELECT c_nationkey, COUNT(*) AS n_active FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
    survey_rows="J4",
    description="Left-semi join (EXISTS) — anti's counterpart.",
)
def j4b_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    orders = _t(spark, sf_dir, "orders")
    active = oj.semi_join_existing(cust, orders, on="o_custkey")
    return active.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_active"))


@register(
    "j5_nearest_neighbor_join",
    """
    WITH pairs AS (
      SELECT s.s_suppkey, p.p_partkey,
             ABS(s.s_acctbal - p.p_retailprice) AS dist,
             ROW_NUMBER() OVER (
               PARTITION BY s.s_suppkey
               ORDER BY ABS(s.s_acctbal - p.p_retailprice) ASC, p.p_partkey ASC
             ) AS rn
      FROM supplier s CROSS JOIN part p
    )
    SELECT s_suppkey, p_partkey AS nn_partkey, ROUND(dist, 6) AS nn_dist
    FROM pairs WHERE rn = 1
    """,
    survey_rows="J5",
    description="k=1 nearest-neighbor join: broadcast cross product + "
    "arg-min window (the dist_to_mrt shape on numeric distance).",
)
def j5_nearest_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # prune both sides before the cross product — the payload struct the
    # arg-min aggregation carries is what the whole 20M-row product pays for
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    dist = F.abs(F.col("s_acctbal") - F.col("p_retailprice"))
    nn = oj.nearest_neighbor_join(supp, part, "s_suppkey", dist, right_keep=["p_partkey"])
    return nn.select(
        "s_suppkey",
        F.col("p_partkey").alias("nn_partkey"),
        F.round("nn_distance", 6).alias("nn_dist"),
    )


# ===========================================================================
# §2.4 / §2.5 Aggregations & windows
# ===========================================================================


@register(
    "a5_top1_event_type_per_user",
    """
    SELECT user_id, event_type, cnt FROM (
      SELECT user_id, event_type, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type ASC
             ) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
    survey_rows="A5,W6",
    description="Mode / top-1-by-frequency per group via ranking window.",
)
def a5_top1_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return agg.top1_per_group(ev, "user_id", "event_type")


@register(
    "a6_pivot_user_hour_profile",
    "SELECT user_id, "
    + ", ".join(
        f"COALESCE(ROUND(AVG(CASE WHEN EXTRACT(hour FROM ts) = {h} THEN value END), 6), 0.0)"
        f' AS "h{h}"'
        for h in range(24)
    )
    + " FROM events GROUP BY user_id",
    survey_rows="A6,W5",
    description="Pivoted user×hour mean-value profile matrix (station×hour shape).",
)
def a6_pivot_user_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("hour", F.hour("ts"))
    wide = (
        ev.groupBy("user_id")
        .pivot("hour", list(range(24)))
        .agg(F.round(F.avg("value"), 6))
        .na.fill(0.0)
    )
    renames = {str(h): f"h{h}" for h in range(24)}
    return wide.withColumnsRenamed(renames)


@register(
    "w1_lag_delta_per_user",
    f"""
    WITH lagged AS (
      SELECT user_id, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS value_lag1
      FROM events
    )
    SELECT user_id,
           COUNT(value_lag1) AS n_deltas,
           {SQL_DAVG('ABS(value - value_lag1)')} AS mean_abs_delta
    FROM lagged GROUP BY user_id
    """,
    survey_rows="W1,W3",
    description="Partitioned lag feature (the reference's R²-lifting lag1) + "
    "per-series delta aggregation.",
)
def w1_lag_delta_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    lagged = ow.lag_features(ev, key="user_id", ts="ts", value_col="value", lags=[1], tiebreak=["event_id"])
    delta = F.abs(F.col("value") - F.col("value_lag1"))
    return lagged.groupBy("user_id").agg(
        F.count("value_lag1").alias("n_deltas"),
        agg.decimal_avg(delta).alias("mean_abs_delta"),
    )


# ===========================================================================
# Driver contract
# ===========================================================================


def entry_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """The flagship query — the driver's smoke check."""
    return flagship_segment_health(spark, sf_dir)
