"""JDBC round-trip smoke (S6/S7) against embedded Apache Derby.

The reference reads/writes MySQL via SQLAlchemy (``etl_job.py:55-61,
121-129``); no DB server exists in this container, but Spark ships the
Derby embedded driver in its own jars directory, so the JDBC code path —
DataFrame → relational table → DataFrame, including the partitioned
parallel read — is executable for real rather than structurally stubbed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youbike_etl_pipeline_spark.sources.readers import read_jdbc
from youbike_etl_pipeline_spark.sources.writers import write_jdbc

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "smokedb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id int, name string, score double",
    )
    write_jdbc(df, derby_url, "roundtrip", mode="overwrite", properties=DERBY_PROPS)
    back = read_jdbc(spark, derby_url, "roundtrip", properties=DERBY_PROPS)
    assert sorted(back.columns) == ["ID", "NAME", "SCORE"] or sorted(
        c.lower() for c in back.columns
    ) == ["id", "name", "score"]
    got = sorted((r[0], r[1], r[2]) for r in back.collect())
    want = sorted((i, f"name_{i}", float(i) * 1.5) for i in range(100))
    assert got == want


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    df = spark.createDataFrame([(i, i % 7) for i in range(500)], "id int, grp int")
    write_jdbc(df, derby_url, "parts", mode="overwrite", properties=DERBY_PROPS)
    back = read_jdbc(
        spark,
        derby_url,
        "parts",
        properties=DERBY_PROPS,
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=500,
    )
    # the range-sliced read is genuinely split into 4 concurrent partitions
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 500
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(500))


def test_jdbc_append_mode_accumulates(spark, derby_url):
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    write_jdbc(df, derby_url, "appends", mode="overwrite", properties=DERBY_PROPS)
    write_jdbc(df, derby_url, "appends", mode="append", properties=DERBY_PROPS)
    back = read_jdbc(spark, derby_url, "appends", properties=DERBY_PROPS)
    assert back.count() == 2
