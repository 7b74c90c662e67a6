"""Window / time-series operators (SURVEY §2.5 W1-W8, §2.2 P10-P11).

Every op partitions by the series key (station/user) and orders by timestamp
— one shuffle on the key, then per-partition sorted evaluation. Orderings
always carry a unique tie-breaker column so results are deterministic when
timestamps collide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def series_window(key: str, ts: str, *tiebreak: str) -> Window:
    """The canonical per-series ordered window."""
    return Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in (ts, *tiebreak)])


def lag_features(
    df: DataFrame, key: str, ts: str, value_col: str, lags: list[int], tiebreak: list[str] | None = None
) -> DataFrame:
    """Partitioned lag features (W1) — the reference's single most
    load-bearing transform (``filling_rate_lag1`` lifts OLS R² 0.02→0.92;
    ``notebooks/01_youbike_analysis.ipynb:L1115-L1118``)."""
    w = series_window(key, ts, *(tiebreak or []))
    return df.withColumns({f"{value_col}_lag{k}": F.lag(value_col, k).over(w) for k in lags})


def sequence_windows(
    df: DataFrame,
    key: str,
    ts: str,
    feature_cols: list[str],
    time_steps: int = 3,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sliding sequence windows (W2): per series, an array of the previous
    ``time_steps`` feature structs predicting the current row — the LSTM
    dataset builder (``notebooks/05_multistation_lstm.ipynb:L224-L248``)
    re-expressed as a pure window ``collect_list`` (no Python loop; scales
    with the shuffle, not the driver). Rows without a full window are
    dropped, matching the reference's range loop."""
    w = series_window(key, ts, *(tiebreak or [])).rowsBetween(-time_steps, -1)
    seq = F.collect_list(F.struct(*[F.col(c) for c in feature_cols])).over(w)
    return (
        df.withColumn("sequence", seq)
        .filter(F.size("sequence") == time_steps)
    )


def ffill(df: DataFrame, key: str, ts: str, cols: list[str], tiebreak: list[str] | None = None) -> DataFrame:
    """Forward fill per series (P10): ``last(col, ignorenulls=True)`` over an
    unbounded-preceding frame (reference ``ffill()``,
    ``notebooks/04_lstm_prediction.ipynb:L237``)."""
    w = series_window(key, ts, *(tiebreak or [])).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumns({c: F.last(c, ignorenulls=True).over(w) for c in cols})


def bfill(df: DataFrame, key: str, ts: str, cols: list[str], tiebreak: list[str] | None = None) -> DataFrame:
    """Backward fill per series (P10): mirror of :func:`ffill`."""
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c).desc() for c in (ts, *(tiebreak or []))])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumns({c: F.last(c, ignorenulls=True).over(w) for c in cols})


def interpolate_linear(
    df: DataFrame, key: str, ts: str, cols: list[str], tiebreak: list[str] | None = None
) -> DataFrame:
    """Groupwise linear interpolation + ffill + bfill (P11) — reference
    ``groupby(...).transform(lambda x: x.interpolate('linear').ffill().bfill())``
    (``notebooks/05_multistation_lstm.ipynb:L194-L196``). No Spark builtin.

    Window formulation (index-based, like pandas' default method='linear' on
    a default RangeIndex): bracket each null run with the previous/next
    non-null value and their row positions, then blend linearly; leading runs
    take the next value (bfill), trailing runs the previous (ffill). Cost:
    one shuffle on ``key``, four window passes — no Python on the data path.
    """
    order = [F.col(c).asc() for c in (ts, *(tiebreak or []))]
    rev = [F.col(c).desc() for c in (ts, *(tiebreak or []))]
    w_fwd = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = Window.partitionBy(key).orderBy(*rev).rowsBetween(Window.unboundedPreceding, 0)
    w_pos = Window.partitionBy(key).orderBy(*order)

    out = df.withColumn("__pos", F.row_number().over(w_pos))
    for c in cols:
        pos_if = F.when(F.col(c).isNotNull(), F.col("__pos"))
        out = (
            out.withColumn("__pv", F.last(c, ignorenulls=True).over(w_fwd))
            .withColumn("__pp", F.last(pos_if, ignorenulls=True).over(w_fwd))
            .withColumn("__nv", F.last(c, ignorenulls=True).over(w_bwd))
            .withColumn("__np", F.last(pos_if, ignorenulls=True).over(w_bwd))
        )
        interp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * (
            (F.col("__pos") - F.col("__pp")) / (F.col("__np") - F.col("__pp"))
        )
        filled = (
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(F.col("__pp").isNull(), F.col("__nv"))  # leading nulls → bfill
            .when(F.col("__np").isNull(), F.col("__pv"))  # trailing nulls → ffill
            .otherwise(interp)
        )
        out = out.withColumn(c, filled).drop("__pv", "__pp", "__nv", "__np")
    return out.drop("__pos")


def interpolate_linear_pandas(
    df: DataFrame, key: str, ts: str, cols: list[str]
) -> DataFrame:
    """``applyInPandas`` fallback for P11 — byte-exact pandas
    ``interpolate('linear').ffill().bfill()`` semantics per series, for
    parity testing the window formulation (grouped-map, Arrow-batched)."""
    schema = df.schema

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable sort: the default quicksort permutes timestamp ties
        # run-to-run, breaking the module's determinism invariant
        pdf = pdf.sort_values(ts, kind="mergesort")
        pdf[cols] = pdf[cols].interpolate("linear").ffill().bfill()
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema=schema)


def deterministic_sample(df: DataFrame, key: str, modulus: int = 10, bucket: int = 0) -> DataFrame:
    """Systematic sample (W7 analogue): keep rows where ``key % modulus ==
    bucket``. Unlike ``df.sample(seed)``, reproducible across engines and
    partitionings — the engine also exposes native ``df.sample`` for
    statistical sampling."""
    return df.filter((F.col(key) % modulus) == bucket)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30.0,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sessionization: assign a session id per (key, activity burst) where a
    new session starts when the gap since the previous event exceeds
    ``gap_minutes`` (the classic lag + conditional cumsum composition —
    SURVEY §2.8 'session windows are free extensions').

    One shuffle on ``key``; the streaming twin is
    ``F.session_window(ts, gap)`` in streaming/ingest.py."""
    w = series_window(key, ts, *(tiebreak or []))
    prev_ts = F.lag(ts).over(w)
    gap_s = F.col(ts).cast("double") - prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | (gap_s > gap_minutes * 60.0), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def hour_bucket(ts: Column) -> Column:
    """Hour flooring (W4) — ``date_trunc('hour', ts)``
    (reference ``dt.floor('h')``, ``notebooks/03_data_merge.ipynb:L79``)."""
    return F.date_trunc("hour", ts)


def bucketed_row_number(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    bucket_width: float,
    out_col: str = "rn",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Two-level ``row_number()`` for LOW-CARDINALITY partition keys — the
    rank twin of ``asof_join(bucket_seconds=...)``.

    ``row_number().over(partitionBy(strata).orderBy(order))`` caps window
    parallelism at the stratum count: a 5-value ``event_type`` stratifier
    leaves 31 of 32 cores idle and single-threadedly sorts (then spills)
    each stratum's whole partition — the full-corpus 100× sweep measured
    the w11 systematic sample at 12.1× for exactly this reason.

    Decomposition: rows sub-bucket by ``floor(order_col / bucket_width)``
    (monotone in the order, so bucket boundaries respect it; ties of the
    primary key stay within one bucket, where ``tiebreak`` columns resolve
    them), each (stratum, bucket) computes a LOCAL row_number in parallel,
    and a (strata × buckets)-sized count frame turns exclusive prefix sums
    into per-bucket offsets. global rn = local rn + offset — identical to
    the single-window ``row_number().over(partitionBy(strata).orderBy(
    order_col, *tiebreak))`` whenever that ordering is total (unique
    ``order_col``, or a unique tiebreak).

    ``order_col`` must be numeric and non-null — ENFORCED: a null
    ``order_col`` raises at execution time rather than silently vanishing
    through the null-unsafe offset join (the single-window twin would have
    kept it nulls-first, so a silent drop would change row counts).
    One extra small shuffle (the count frame) buys
    parallelism = strata × buckets.
    """
    bkt = F.when(
        F.col(order_col).isNull(),
        F.raise_error(
            F.lit(
                f"bucketed_row_number: null {order_col!r} — the two-level "
                "decomposition requires a non-null order column; drop/fill "
                "nulls first or use the single-window row_number()"
            )
        ).cast("long"),
    ).otherwise(F.floor(F.col(order_col) / F.lit(float(bucket_width))).cast("long"))
    tagged = df.withColumn("__bkt", bkt)
    w_loc = Window.partitionBy(*part_cols, "__bkt").orderBy(
        F.col(order_col).asc(), *[F.col(c).asc() for c in (tiebreak or [])]
    )
    counts = tagged.groupBy(*part_cols, "__bkt").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL-SAFE join on the partition columns: the single-window twin keeps
    # a null stratum as its own partition, so a null-unsafe equi-join here
    # would silently drop those rows (same failure class as the null
    # order_col this function already raises on). The offset frame is
    # strata x buckets — broadcast it.
    offsets = F.broadcast(
        counts.select(
            *[F.col(c).alias(f"__p_{c}") for c in part_cols],
            F.col("__bkt").alias("__obkt"),
            F.coalesce(F.sum("__n").over(w_off), F.lit(0)).cast("long").alias("__off"),
        )
    )
    cond = F.col("__bkt") == F.col("__obkt")
    for c in part_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__p_{c}"))
    return (
        tagged.withColumn("__lrn", F.row_number().over(w_loc))
        .join(offsets, cond)
        .withColumn(out_col, (F.col("__lrn") + F.col("__off")).cast("int"))
        .drop("__bkt", "__lrn", "__off", "__obkt", *[f"__p_{c}" for c in part_cols])
    )


def bucketed_ntile(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    n_tiles: int,
    bucket_width: float,
    out_col: str = "bucket",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Two-level ``ntile(n)`` for low-cardinality partition keys, derived
    arithmetically from :func:`bucketed_row_number` plus per-stratum counts
    (ntile's definition: with N rows and n tiles, the first ``N mod n``
    tiles take ``N div n + 1`` rows, the rest ``N div n``) — equi-depth
    histograms / quartile assignment without one single-threaded sort per
    stratum. Answer-identical to ``ntile(n).over(partitionBy(strata)
    .orderBy(order_col, *tiebreak))`` for total orderings; the full-corpus
    100× sweep measured the 5-stratum a22 at 11.5× without this, 3.6× with.
    """
    ranked = bucketed_row_number(
        df, part_cols, order_col, bucket_width, out_col="__rn", tiebreak=tiebreak
    )
    # null-safe on part_cols for the same reason as bucketed_row_number's
    # offset join: a null stratum is a real ntile partition, not a drop
    ns = F.broadcast(
        df.groupBy(*part_cols)
        .agg(F.count(F.lit(1)).alias("__N"))
        .select(
            *[F.col(c).alias(f"__q_{c}") for c in part_cols], "__N"
        )
    )
    cond = F.lit(True)
    for c in part_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__q_{c}"))
    ranked = ranked.join(ns, cond).drop(*[f"__q_{c}" for c in part_cols])
    base = ((F.col("__N") - F.pmod(F.col("__N"), n_tiles)) / n_tiles).cast("long")
    extra = F.pmod(F.col("__N"), n_tiles)
    cutoff = extra * (base + 1)
    tile = F.when(
        F.col("__rn") <= cutoff, F.floor((F.col("__rn") - 1) / (base + 1)) + 1
    ).otherwise(extra + F.floor((F.col("__rn") - 1 - cutoff) / base) + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop("__rn", "__N")
