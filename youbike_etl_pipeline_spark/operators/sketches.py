"""Mergeable distinct sketches — a from-scratch HyperLogLog whose hash,
register math, and estimator are PORTABLE (md5-derived, integer-only rank
extraction), so the whole sketch is reproducible bit-for-bit in ANSI SQL
and the correctness gate can verify it exactly — unlike
``approx_count_distinct``'s opaque engine internals (which remain the
production fast path; see ``plans/corpus.py::approx_sketches``).

Reference context: the reference counts distincts exactly in SQL
(``sql/init_schema.sql`` unique keys, notebook ``nunique()`` calls); the
sketch family is this engine's 100 TB extension — register maxima merge
map-side and the reduced state is ``m`` rows per group forever, the
property that makes distinct-counting mergeable across partitions,
micro-batches, and days.

HLL layout (m = 256): the 64-bit md5 hash's low 8 bits pick the register;
the rank is the first-set-bit position of the remaining 56 bits, computed
as ``LENGTH(BIN(w & -w))`` — pure integer ops, no floating log, identical
on any engine with two's-complement longs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_token_hash64

#: number of registers (2^8); the register index is the hash's low byte.
HLL_M = 256


def hll_rho(w: Column) -> Column:
    """Rank of the first set bit of ``w`` (1-based); 57 for w == 0 (all 56
    payload bits zero). ``w & -w`` isolates the lowest set bit (two's
    complement); ``LENGTH(BIN(.))`` reads its position without floating
    point."""
    return (
        F.when(w == 0, F.lit(57))
        .otherwise(F.length(F.bin(w.bitwiseAND(-w))))
    )


def hll_register_frame(
    df: DataFrame, group_cols: list[str], value_col: Column
) -> DataFrame:
    """(group..., reg, maxrho) register maxima for the values in
    ``value_col`` (stringified before hashing). Mergeable: the max of two
    register frames over row-disjoint inputs equals the register frame of
    the union — the property the streaming twin proves."""
    h = df.select(*group_cols, md5_token_hash64(value_col.cast("string")).alias("hv"))
    rw = h.select(
        *group_cols,
        F.col("hv").bitwiseAND(F.lit(HLL_M - 1)).alias("reg"),
        F.shiftrightunsigned(F.col("hv"), 8).alias("w"),
    )
    rho = rw.select(*group_cols, "reg", hll_rho(F.col("w")).alias("rho"))
    return rho.groupBy(*group_cols, "reg").agg(F.max("rho").alias("maxrho"))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., n_regs, e_hll) HLL estimate from a register frame, with
    the linear-counting small-range correction below 2.5m. The harmonic
    denominator sums exact DECIMAL(38,0) powers of two; the estimator is a
    fixed IEEE chain, so two engines computing it from equal registers get
    equal doubles."""
    m = HLL_M
    z = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(62) - F.col("maxrho")).cast("decimal(38,0)")
        ).alias("s_present"),
    )
    alpha_m2_p62 = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    ) * F.lit(float(m * m)) * F.pow(F.lit(2.0), F.lit(62))
    e_raw = alpha_m2_p62 / (
        F.col("s_present")
        + (F.lit(m) - F.col("n_regs"))
        * F.pow(F.lit(2.0), F.lit(62)).cast("decimal(38,0)")
    ).cast("double")
    est = z.select(*group_cols, "n_regs", e_raw.alias("e_raw"))
    e_hll = F.when(
        (F.col("e_raw") <= F.lit(2.5) * F.lit(float(m)))
        & (F.col("n_regs") < m),
        F.lit(float(m))
        * F.log(F.lit(float(m)) / (F.lit(float(m)) - F.col("n_regs"))),
    ).otherwise(F.col("e_raw"))
    return est.select(*group_cols, "n_regs", e_hll.alias("e_hll"))
