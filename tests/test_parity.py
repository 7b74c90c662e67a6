"""Local mirror of the driver's correctness gate — DRIVER-STRICT since r3.

For every corpus query with an oracle: run the Spark query and the DuckDB SQL
on the same parquet tables, materialize BOTH as pandas frames the way the
driver does (Spark rows via pd.DataFrame, DuckDB via .df() so HUGEINT →
float64 is visible), and compare the canonical stringified cells. Types are
NOT coerced: an oracle `SUM(int col)` without CAST(... AS BIGINT) fails here
exactly as it fails at the driver (the round-1/2 red class — 15 queries
shipped because the old comparator did float(a)==float(b) across types).
Queries without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from youbike_etl_pipeline_spark.parity import diff_frames, spark_to_pandas
from youbike_etl_pipeline_spark.plans.corpus import CORPUS
from youbike_etl_pipeline_spark.schemas import TESTDATA_TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


ORACLE_SPECS = [s for s in CORPUS.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in CORPUS.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, spec, sf_small):
    spark_df = spec.fn(spark, sf_small)
    spark_pd = spark_to_pandas(spark_df.collect(), spark_df.columns)

    con = _duck(sf_small)
    duck_pd = con.execute(spec.oracle).df()

    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{spec.name}: column mismatch spark={sorted(spark_pd.columns)} "
        f"duck={sorted(duck_pd.columns)}"
    )
    diff = diff_frames(spark_pd, duck_pd)
    assert diff is None, f"{spec.name}: {diff}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_smoke(spark, spec, sf_small):
    df = spec.fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
