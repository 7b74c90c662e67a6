"""Local mirror of the driver's correctness gate.

For every corpus query with an oracle: run the Spark query and the DuckDB SQL
on the same parquet tables, then compare row count, sorted column names, and
**exact** cell values (floats must match bit-for-bit after the corpus's
decimal/rounding discipline — if this test passes, the driver's
order-insensitive value hash matches too). Queries without an oracle get a
rows-run smoke check.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from youbike_etl_pipeline_spark.plans.corpus import CORPUS
from youbike_etl_pipeline_spark.schemas import TESTDATA_TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, then rows by value — order-insensitive compare."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(v):
        return (v is None, str(type(v)), str(v))

    projected = [tuple(r[i] for i in order) for r in rows]
    return sorted(projected, key=lambda r: tuple(key(v) for v in r))


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb
    return a == b


ORACLE_SPECS = [s for s in CORPUS.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in CORPUS.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, spec, sf_small):
    spark_df = spec.fn(spark, sf_small)
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = _duck(sf_small)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{spec.name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{spec.name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    for i, (rs, rd) in enumerate(zip(ns, nd)):
        for j, (a, b) in enumerate(zip(rs, rd)):
            assert _cells_equal(a, b), (
                f"{spec.name}: cell mismatch row {i} col {sorted(spark_cols)[j]}: "
                f"spark={a!r} duck={b!r}"
            )


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_smoke(spark, spec, sf_small):
    df = spec.fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
