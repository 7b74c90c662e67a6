"""Scalar and array column expressions — pure Catalyst, no UDFs."""

from .arrays import cosine_similarity, dot_product, l2_norm
from .scalar import (
    clamp_round_nonneg,
    filling_rate,
    haversine_m,
    is_peak_hour,
    is_weekday,
    rain_category,
    shortage_label,
    to_utc_from_tz,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "clamp_round_nonneg",
    "filling_rate",
    "haversine_m",
    "is_peak_hour",
    "is_weekday",
    "rain_category",
    "shortage_label",
    "to_utc_from_tz",
]
