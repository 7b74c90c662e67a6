"""Generate SCALING.md: wall-clock of representative queries across scale
factors, plus a synthetic 10× blow-up of sf0.1 (≈6M lineitem rows / 100k
events-per-table union) to show the scaling slope beyond the provided data.

The point is the SLOPE, not the absolute numbers: a query whose time grows
~linearly from sf0.001→sf0.1→10×sf0.1 is shuffle/scan-bound the way a
cluster run would be; super-linear growth flags an operator that won't
survive the 100 TB target.

Usage: python tools/scaling_report.py [> SCALING.md]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youbike_etl_pipeline_spark.plans.corpus import CORPUS  # noqa: E402
from youbike_etl_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    "flagship_segment_health",
    "a1_tpch_q1_pricing_summary",
    "q3_shipping_priority",
    "w1_lag_delta_per_user",
    "j5_nearest_neighbor_join",
    "t1_exact_dedup",
    "t2_ngram_jaccard_pairs",
    "t7_minhash_lsh_dedup",
    "s1_cosine_topk",
    "s2_embedding_near_dup",
    # r3 size-routed percentile family — slopes must stay flat now that the
    # exact path hands off to percentile_approx above the per-group bound
    "a3_describe_block",
    "m10b_group_quartiles",
    "m12_median_absolute_deviation",
    # shares t2's checkpointed pair graph + size-routed components
    "t10_dedup_clusters",
    # r4 additions: scan-agg pushdown floor, 5-dim broadcast fact join,
    # user-keyed funnel chain, mapInPandas frame fan-out
    "q6_forecast_revenue",
    "q8_national_market_share",
    "ev1_funnel_conversion",
    "mm4_frame_sample",
    # r4b/4c additions: double-agg join-back, EXISTS/NOT-EXISTS semi/anti
    # pair, bounded-pool negative sampling, sequence construction
    "q2_min_cost_supplier",
    "q21_suppliers_kept_waiting",
    "t27_user_event_sequences",
    "t28_negative_sampling",
    # r4d additions: segment-dfreq equi-join (claims linear, unlike t2),
    # train-then-score LM loop, map+agg sharding, bucketed semantic dedup
    "t30_boilerplate_segments",
    "t31_lm_perplexity_filter",
    "t32_content_shard_assignment",
    "s6_semantic_dedup",
    # r4e additions: query-term-filtered posting join (claims O(matches)),
    # zero-join hashed scoring, first-seen shingle join (claims linear),
    # source-pair self-join (claims bounded by source-count²), boundary-
    # broadcast bucketing, multi-assignment sliding distinct, band join
    # attribution, pair-graph-riding threshold sweep
    "s7_bm25_retrieval",
    "t34_hashed_quality_classifier",
    "t35_ngram_novelty",
    "t36_cross_source_overlap",
    "ev5_rfm_segmentation",
    "w19_rolling_distinct_users",
    "ev6_linear_attribution",
    "t37_jaccard_threshold_sweep",
    # r4e batch 2: basket-bounded co-visitation self-join, winsorize/
    # target-encode/skew-audit aggregations, spectral decode, rank stats,
    # gap/change-point windows, drift reduction, iterative graph ops
    "r1_item_covisitation",
    "f18_winsorized_stats",
    "f19_target_encoding",
    "dq6_join_key_skew",
    "mm6_audio_dft_bands",
    "m17_levene_brown_forsythe",
    "dq7_data_gaps",
    "m18_two_proportion_ztest",
    "e2_embedding_drift",
    "m19_lag1_autocorrelation",
    "g1_item_pagerank",
    "g2_triangle_clustering",
    "w20_cusum_change_point",
    # r4e final batches: range-bucketed global midranks, vocab top-k OLS,
    # partition-local perceptual hashing + bucket group-by, two-top-k rank
    # fusion, degree joins on the thresholded co-visitation graph
    "m21_kruskal_wallis",
    "t39_zipf_law_fit",
    "mm7_image_ahash_neardup",
    "s8_rrf_hybrid_retrieval",
    "g3_degree_assortativity",
    # r4g additions: pairwise tau on the per-user aggregate (quadratic only
    # in users — slope shows where the sample route kicks in), two-hop
    # link prediction, doc-freq-capped containment index (claims linear
    # like t2's index, pair stage bounded by collisions), 200x replicate
    # fan-outs (repartitioned — slopes must stay ~linear), gram-matrix
    # power iteration (64x64 regardless of rows), PMI vocabulary-floored
    # pair fan-out, blocked linkage + component closure
    "m28_kendall_tau",
    "g6_ra_link_prediction",
    "t46_containment_pairs",
    "m25_poisson_bootstrap_ci",
    "m30_randomization_test",
    "e8_power_iteration_audit",
    "t47_pmi_cooccurrence",
    "er2_golden_record",
    # round-4g additions: interpolation join, incremental dedup ledger,
    # interval-union coverage, weekly cardinality drift, time-weighted avg
    "j13_interpolation_join",
    "t48_incremental_dedup_ledger",
    "w28_interval_coverage",
    "dq12_cardinality_drift",
    "w29_time_weighted_avg",
    # lossless exact-similarity route (contrast t2: slope on the verbatim
    # blow-up is inherent pair-output growth, not candidate explosion)
    "t49_prefix_filter_jaccard",
]

SCALE_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def blow_up_sf01(spark, out_dir: str, copies: int = 10) -> None:
    """Union sf0.1 with itself ``copies`` times, re-keying ids so joins and
    dedup behave as if the data were genuinely bigger."""
    import pyspark.sql.functions as F

    os.makedirs(out_dir, exist_ok=True)
    shifts = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for table in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
        path = f"{out_dir}/{table}.parquet"
        if os.path.exists(path):
            continue
        if table == "events":
            from youbike_etl_pipeline_spark.sources.readers import read_events

            base = read_events(spark, "/root/testdata/sf0.1")
        else:
            base = spark.read.parquet(f"/root/testdata/sf0.1/{table}.parquet")
        if table in ("region", "nation"):
            base.write.mode("overwrite").parquet(path)
            continue
        parts = []
        for i in range(copies):
            df = base
            for key in shifts.get(table, []):
                df = df.withColumn(key, F.col(key) + F.lit(i * 100_000_000))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(path)


def main() -> None:
    spark = get_spark(app_name="scaling-report")
    big_dir = "/tmp/spark_graft_sf1_synth"
    blow_up_sf01(spark, big_dir)
    dirs = SCALE_DIRS + [big_dir]
    labels = ["sf0.001", "sf0.01", "sf0.1", "10x sf0.1 (synthetic)"]

    # warmup
    CORPUS[QUERIES[0]].fn(spark, SCALE_DIRS[0]).write.mode("overwrite").format("noop").save()

    rows = []
    for name in QUERIES:
        times = []
        for d in dirs:
            # min of 2 runs per cell: a single shot is dominated by JIT /
            # GC / page-cache noise on this box (observed 5-25 s random
            # spikes), which wrecks the slope column. The minimum is the
            # right statistic for "how much work does this plan do".
            best = float("inf")
            for _ in range(2):
                # cache-honest like bench.py: clear session-shared
                # materializations (t2/t10's checkpointed pair graph) so
                # every run pays the true cost — otherwise the min reads a
                # warm checkpoint and reports cache latency, not plan work
                from youbike_etl_pipeline_spark.plans import corpus as _corpus

                _corpus._PAIR_GRAPH_CACHE.clear()
                t0 = time.perf_counter()
                CORPUS[name].fn(spark, d).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        rows.append((name, times))

    print("# SCALING — wall-clock vs scale factor")
    print()
    print("Generated by `tools/scaling_report.py` on local[32]. The last column")
    print("is a synthetic 10× union of sf0.1 (ids re-keyed) ≈ 6M lineitem /")
    print("100k events rows. Judge the slope, not the constants: Spark's fixed")
    print("per-query overhead (~0.5-1s) dominates the small SFs.")
    print("Each cell is the MIN of 2 runs (suppresses JIT/GC spikes).")
    print()
    print("| query | " + " | ".join(labels) + " | slope 0.1→10× |")
    print("|---|" + "---|" * (len(labels) + 1))
    for name, times in rows:
        slope = times[3] / times[2] if times[2] > 0 else float("nan")
        cells = " | ".join(f"{t:.2f}s" for t in times)
        print(f"| {name} | {cells} | {slope:.1f}× |")


if __name__ == "__main__":
    main()
