"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youbike_etl_pipeline_spark.session import get_spark

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA_ROOT, "sf0.001")
SF_MEDIUM = os.path.join(TESTDATA_ROOT, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    # local[8]/8 halves the suite's wall-clock vs local[4]/4 on the 32-core
    # host (tests run sequentially; per-job parallelism is the only lever
    # without xdist). Result parity is partitioning-independent — proven
    # separately by the adversarial driver sim (SIM_SHUF/SIM_MASTER).
    session = get_spark(
        app_name="engine-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g", "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield session


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium() -> str:
    return SF_MEDIUM
