"""Distributed statistics layer — closed-form inference from sufficient
statistics computed as DataFrame aggregations (SURVEY §2.7)."""

from .inference import (
    anova_oneway,
    chi_square_independence,
    group_confidence_intervals,
    moment_stats,
    tukey_hsd_pairs,
    welch_ttest,
)

__all__ = [
    "anova_oneway",
    "chi_square_independence",
    "group_confidence_intervals",
    "moment_stats",
    "tukey_hsd_pairs",
    "welch_ttest",
]
