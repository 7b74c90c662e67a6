"""Data-quality validation — constraint checking as one aggregation.

Generalizes the reference's fail-fast required-column check
(``etl_job.py:89-97``) into declarative row-level constraints evaluated in a
single pass: each constraint contributes a violation-count expression to one
hash aggregation, so validating a 100 TB table costs one scan regardless of
how many constraints are declared (the deequ-style formulation). Uniqueness
constraints need a distinct count and are evaluated in the same job via a
second tiny aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Constraint:
    name: str
    predicate: Column  # True ⇒ row violates


def not_null(col: str) -> Constraint:
    return Constraint(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo: float | None = None, hi: float | None = None) -> Constraint:
    pred = F.lit(False)
    if lo is not None:
        pred = pred | (F.col(col) < lo)
    if hi is not None:
        pred = pred | (F.col(col) > hi)
    return Constraint(f"{col}_in_range", F.col(col).isNotNull() & pred)


def in_set(col: str, allowed: list) -> Constraint:
    return Constraint(f"{col}_in_set", F.col(col).isNotNull() & ~F.col(col).isin(allowed))


def matches(col: str, regex: str) -> Constraint:
    return Constraint(
        f"{col}_matches", F.col(col).isNotNull() & ~F.col(col).rlike(regex)
    )


def validate(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """One-pass constraint report: (constraint, n_rows, n_violations,
    violation_rate) per declared constraint, long form."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(c.predicate, 1).otherwise(0)).alias(c.name) for c in constraints
    ]
    row = df.agg(*aggs)
    stacked = row.selectExpr(
        "n_rows",
        "stack({}, {}) as (constraint, n_violations)".format(
            len(constraints),
            ", ".join(f"'{c.name}', {c.name}" for c in constraints),
        ),
    )
    return stacked.select(
        "constraint",
        "n_rows",
        "n_violations",
        (F.col("n_violations") / F.col("n_rows")).alias("violation_rate"),
    )


def check_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness report for a candidate key: total rows, distinct keys,
    duplicate rows."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(*[F.col(k) for k in keys]).alias("n_distinct_keys"),
    ).select(
        F.lit("_".join(keys) + "_unique").alias("constraint"),
        "n_rows",
        (F.col("n_rows") - F.col("n_distinct_keys")).alias("n_violations"),
        ((F.col("n_rows") - F.col("n_distinct_keys")) / F.col("n_rows")).alias(
            "violation_rate"
        ),
    )


def observe_quality(
    df: DataFrame, name: str, constraints: list[Constraint]
) -> tuple[DataFrame, "Observation"]:
    """Single-pass data-quality observability: piggyback violation counts on
    whatever action the caller runs next (``df.observe``), instead of a
    second scan over the data.

    ``validate`` (above) answers "how bad is it" with its own aggregation
    job; this attaches the same counts to the PRODUCTION query — at 100 TB
    the difference is one full scan. Returns ``(df, observation)``; after
    any action on ``df`` (or a descendant), ``observation.get`` holds
    ``{"n_rows": ..., "viol_<constraint>": ...}``. Works on batch frames;
    for streams use the same metrics via ``df.observe(name, *exprs)`` and
    the StreamingQueryListener's ``observedMetrics``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in constraints:
        # Constraint.predicate is True ⇔ the row VIOLATES (see validate)
        metrics.append(
            F.sum(F.when(c.predicate, 1).otherwise(0)).alias(f"viol_{c.name}")
        )
    return df.observe(obs, *metrics), obs
