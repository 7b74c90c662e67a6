"""Driver-scale parity gate: every oracle query hash-compared at sf0.01.

The driver grades at sf0.01 while the always-on local gate
(``test_parity.py``) runs at sf0.001 — the round-1 failures (f12/m4/m6/
t3/t5) were exactly scale/seed-dependent drift that passed small and failed
big. This module mirrors the driver's compare (sorted columns, sorted rows,
exact float equality) at the driver's scale.

Gated behind ``SPARK_GRAFT_SF01=1`` because it adds ~3 minutes: run it
before every round-end (the verify skill lists it), or use
``python tools/driver_sim.py`` which is the same check as a standalone
script with per-query timing.
"""

from __future__ import annotations

import os

import pytest

from tests.test_parity import ORACLE_SPECS, _cells_equal, _duck, _normalize

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01") != "1",
    reason="sf0.01 full parity is opt-in (SPARK_GRAFT_SF01=1); "
    "tools/driver_sim.py is the standalone equivalent",
)


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity_sf01(spark, spec, sf_medium):
    spark_df = spec.fn(spark, sf_medium)
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = _duck(sf_medium)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    for i, (rs, rd) in enumerate(zip(ns, nd)):
        for j, (a, b) in enumerate(zip(rs, rd)):
            assert _cells_equal(a, b), (
                f"{spec.name}: cell mismatch row {i} col {sorted(spark_cols)[j]}: "
                f"spark={a!r} duck={b!r}"
            )
