"""Array (embedding) column expressions — JVM-side vector math.

The reference has no array types; these back the engine's similarity-search
and near-dup extensions over ``embeddings.embedding: array<float>``
(TESTDATA.md). All expressions use ``F.zip_with`` / ``F.aggregate`` —
evaluated in the JVM per row, no Python, so a 100 TB embedding table streams
through codegen. Inputs are cast to double first: float32 arithmetic would
diverge from any double-based oracle and loses precision in long sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product then left-to-right sum (deterministic order)."""
    prod = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
