"""Projection / rename / dedup / filter / null-handling (SURVEY §2.2 P1-P12).

All pure DataFrame transformations — Catalyst folds them into the scan
(column pruning + predicate pushdown), so they cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Synonym map for station-id columns across sources
#: (reference ``notebooks/03_data_merge.ipynb:L56-L63``).
STATION_KEY_SYNONYMS = {
    "sno": "station_no",
    "SNO": "station_no",
    "StationUID": "station_no",
    "station_id": "station_no",
}


def project(df: DataFrame, columns: list[str]) -> DataFrame:
    """Column projection (P1) — reference ``etl_job.py:99,103``."""
    return df.select(*columns)


def rename_positional(df: DataFrame, names: list[str]) -> DataFrame:
    """Bulk positional rename (P2): ``df.columns = [...]`` equivalent
    (reference ``etl_job.py:100,104``)."""
    if len(names) != len(df.columns):
        raise ValueError(f"expected {len(df.columns)} names, got {len(names)}")
    return df.toDF(*names)


def rename_synonyms(df: DataFrame, mapping: dict[str, str] | None = None) -> DataFrame:
    """Guarded synonym rename (P3): apply ``old → new`` only when ``old``
    exists and ``new`` is not already present, avoiding duplicate targets
    (reference ``notebooks/03_data_merge.ipynb:L56-L63``)."""
    mapping = mapping or STATION_KEY_SYNONYMS
    out = df
    for old, new in mapping.items():
        if old in out.columns and new not in out.columns:
            out = out.withColumnRenamed(old, new)
    return out


def dedup_by_key(df: DataFrame, keys: list[str], order_by: list[str] | None = None) -> DataFrame:
    """Deduplicate by key (P4).

    Plain ``dropDuplicates(keys)`` keeps an *arbitrary* row per key —
    nondeterministic under distribution. When ``order_by`` is given, keep the
    first row per key under that ordering instead (deterministic; one shuffle
    on ``keys`` either way)."""
    if not order_by:
        return df.dropDuplicates(keys)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def distinct_pairs(df: DataFrame, columns: list[str]) -> DataFrame:
    """Distinct projection (P5) — reference
    ``notebooks/01_youbike_analysis.ipynb:L684``."""
    return df.select(*columns).distinct()


def fill_null(df: DataFrame, values: dict) -> DataFrame:
    """Constant null fill (P9) — reference
    ``notebooks/05_multistation_lstm.ipynb:L91``."""
    return df.na.fill(values)


def drop_null(df: DataFrame, subset: list[str]) -> DataFrame:
    """Null drop (P8) — reference ``notebooks/01_youbike_analysis.ipynb:L72``."""
    return df.na.drop(subset=subset)


def coerce_numeric(df: DataFrame, columns: list[str], to: str = "double") -> DataFrame:
    """``pd.to_numeric(errors='coerce')`` equivalent (P12): ``try_cast`` maps
    unparseable values to null instead of failing
    (reference ``notebooks/01_youbike_analysis.ipynb:L65``)."""
    return df.withColumns({c: F.col(c).try_cast(to) for c in columns})


def cast_keys_to_string(df: DataFrame, keys: list[str]) -> DataFrame:
    """Join-key string normalization (P12) — the reference's ``astype(str)``
    discipline (``notebooks/03_data_merge.ipynb:L71-L72``)."""
    return df.withColumns({k: F.col(k).cast("string") for k in keys})
