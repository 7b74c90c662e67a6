"""1000x probe: a third slope point for the headline families.

SCALING.md has sf0.1 -> 10x and 10x -> 100x for every corpus query; this
probe adds 100x -> 1000x (600M lineitem rows / 100M events / 5M docs on
local[32]) for a handful of headline operators — the scan-agg floor, the
broadcast star join, exact dedup's linear hash shuffle, and the two
event-sequence shapes. The point is confirming the ~10x-per-decade slope
holds one more decade, at a data size where any hidden super-linear term
or driver-side materialization would be unmissable.

The 1000x tables build via one sequence-explode per table (not a
1000-way union — plan size stays constant) with the same disjoint
id-shift re-keying as the 10x/100x harness.

Usage: python tools/scale1000_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from youbike_etl_pipeline_spark.plans.corpus import CORPUS  # noqa: E402
from youbike_etl_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    "a1_tpch_q1_pricing_summary",
    "flagship_segment_health",
    "q3_shipping_priority",
    "t1_exact_dedup",
    "w9_sessionization",
    "ev3_transition_matrix",
]

SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]


def blow_up_1000(spark, out_dir: str, copies: int = 1000) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for table in TABLES:
        path = f"{out_dir}/{table}.parquet"
        if os.path.exists(path):
            continue
        if table == "events":
            from youbike_etl_pipeline_spark.sources.readers import read_events

            base = read_events(spark, "/root/testdata/sf0.1")
        else:
            base = spark.read.parquet(f"/root/testdata/sf0.1/{table}.parquet")
        if table in ("region", "nation", "supplier", "part"):
            base.write.mode("overwrite").parquet(path)
            continue
        t0 = time.perf_counter()
        # sf0.1 files are single-row-group, so without this the explode runs
        # in ONE task; spreading the base first parallelizes the 1000x fan-out
        out = base.repartition(64).withColumn(
            "__c", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(copies - 1).cast("long")))
        )
        for key in SHIFTS.get(table, []):
            out = out.withColumn(
                key, F.col(key) + F.col("__c") * F.lit(100_000_000).cast("long")
            )
        out.drop("__c").write.mode("overwrite").parquet(path)
        print(f"built {table} x{copies}: {time.perf_counter() - t0:.0f}s", flush=True)


def main() -> None:
    names = sys.argv[1:] or QUERIES
    spark = get_spark(app_name="scale1000-probe")
    dir100 = "/tmp/spark_graft_sf10_synth"
    dir1000 = "/tmp/spark_graft_sf100x10_synth"
    from scaling_report import blow_up_sf01

    # PROBE1000_TABLES=documents,events limits the blow-up to the tables
    # the probed queries actually read (the codec family needs only
    # documents — building 600M lineitem rows for a WAV probe is waste)
    tables_env = os.environ.get("PROBE1000_TABLES")
    if tables_env:
        global TABLES
        TABLES = [t for t in TABLES if t in tables_env.split(",")]
    # the 100x dir is usually already built by the sweep; blow_up_sf01
    # skips per-table on existence, so this is a no-op when warm
    blow_up_sf01(spark, dir100, copies=100)
    blow_up_1000(spark, dir1000, copies=1000)

    # the sweep's watchdog budget (job-group cancel), so one pathological
    # query at 600M rows cannot stall the whole probe
    from scale_sweep import timed_run

    budget = float(os.environ.get("PROBE1000_BUDGET", "900"))

    def cell(r: dict) -> str:
        if "timeout" in r:
            return f"TIMEOUT>{r['timeout']}s"
        if "err" in r:
            return "ERR " + r["err"][:60]
        return f"{r['sec']}s"

    print()
    print("## 1000x probe (100x -> 1000x of sf0.1; linear ~ 10x)")
    print()
    print("| query | 100x | 1000x | ratio |")
    print("|---|---|---|---|")
    # min-of-N (the mm27 lesson: a single 1000x shot can be 4x off its
    # steady state from shuffle-file warmup and JIT — PROBE1000_REPEATS
    # controls it, default 3)
    repeats = max(1, int(os.environ.get("PROBE1000_REPEATS", "3")))

    def min_run(name: str, d: str) -> dict:
        best: dict = {}
        for _ in range(repeats):
            r = timed_run(spark, name, d, budget)
            if "sec" in r and ("sec" not in best or r["sec"] < best["sec"]):
                best = r
            elif not best:
                best = r
        return best

    for name in names:
        timed_run(spark, name, dir100, budget)  # warm
        r100 = min_run(name, dir100)
        r1000 = min_run(name, dir1000)
        ratio = (
            f"{r1000['sec'] / r100['sec']:.1f}x"
            if "sec" in r100 and "sec" in r1000
            else "-"
        )
        print(f"| {name} | {cell(r100)} | {cell(r1000)} | {ratio} |", flush=True)


if __name__ == "__main__":
    main()
