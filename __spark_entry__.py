"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's named-query corpus
(``youbike_etl_pipeline_spark/plans/corpus.py``): every implemented SURVEY §2
operator registers a (Spark query, DuckDB oracle SQL) pair there; this module
re-exports them in the driver's expected shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from youbike_etl_pipeline_spark.plans import corpus as _corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _corpus.entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _corpus.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (omitted ⇒ rows-only check)."""
    return _corpus.oracle_sql()
