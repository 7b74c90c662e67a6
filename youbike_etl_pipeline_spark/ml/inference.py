"""Batch model inference on Spark (SURVEY §2.7 M11 — the only reference
surface that stays out of relational scope).

The reference serves a PyTorch LSTM per-request (``api/app/main.py:139-204``);
Spark's role is *batch* scoring: a Pandas UDF wrapping the model, Arrow
batches in, predictions out — the model broadcast once per executor, not
per row. torch is absent in this container, so the wrapper is stubbed by
contract: it validates shapes and raises ``NotImplementedError`` at the
model-call site, with a deterministic fake available for pipeline tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - torch not in this environment
    import torch  # noqa: F401

    _HAS_TORCH = True
except ImportError:  # pragma: no cover
    _HAS_TORCH = False


def batch_predict_sequences(
    df: DataFrame,
    sequence_col: str = "sequence",
    id_cols: tuple[str, ...] = ("station_no",),
    fake: bool = True,
) -> DataFrame:
    """Score sliding-window sequences (W2 output) in Arrow batches.

    ``fake=True`` predicts the mean of the window's first feature —
    deterministic, keeps the distributed contract testable. ``fake=False``
    requires torch (stub raises here, marking the real-model call site).
    """
    out_schema = T.StructType(
        [*[df.schema[c] for c in id_cols], T.StructField("prediction", T.DoubleType(), True)]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                if not _HAS_TORCH:
                    raise NotImplementedError(
                        "torch LSTM inference requires torch — not available in "
                        "this environment; stubbed by contract (SURVEY §2.7 M11)"
                    )
            preds = pdf[sequence_col].map(
                lambda seq: float(
                    sum(step["value"] for step in seq) / max(len(seq), 1)
                )
                if seq is not None and len(seq) > 0
                else None
            )
            yield pd.DataFrame({**{c: pdf[c] for c in id_cols}, "prediction": preds})

    return df.select(*id_cols, sequence_col).mapInPandas(fn, schema=out_schema)
