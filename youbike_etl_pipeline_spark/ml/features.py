"""Feature preparation: MinMax scaling with exact inverse (SURVEY §2.6 F13)
and the sequence-window dataset builder (W2, via operators.windows).

The reference uses sklearn's MinMaxScaler and inverts predictions through a
dummy-matrix trick (``notebooks/04_lstm_prediction.ipynb:L320-L329``). Here
scaling is column arithmetic against aggregated min/max (broadcast as a
literal map) — exactly invertible, no sklearn state to pickle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minmax_fit(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One aggregation pass → {col: (min, max)} — the scaler 'model'."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (float(row[f"__min_{c}"]), float(row[f"__max_{c}"])) for c in cols}


def minmax_transform(df: DataFrame, bounds: dict[str, tuple[float, float]]) -> DataFrame:
    """x → (x−min)/(max−min), constant columns → 0.0 (sklearn behavior)."""
    out = df
    for c, (lo, hi) in bounds.items():
        if hi > lo:
            out = out.withColumn(c, (F.col(c) - lo) / (hi - lo))
        else:
            out = out.withColumn(c, F.lit(0.0))
    return out


def minmax_inverse(df: DataFrame, bounds: dict[str, tuple[float, float]]) -> DataFrame:
    """Exact inverse: x → x·(max−min)+min."""
    out = df
    for c, (lo, hi) in bounds.items():
        out = out.withColumn(c, F.col(c) * (hi - lo) + lo)
    return out
