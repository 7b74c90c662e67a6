"""The reference's four dataflows recomposed on the engine layers
(SURVEY §3.1/§3.2, §7 step 4): ingest, weather, gold merge, tableau export."""

from .youbike import (
    build_gold_table,
    ingest_snapshot,
    tableau_master_dataset,
    weather_to_df,
)

__all__ = [
    "build_gold_table",
    "ingest_snapshot",
    "tableau_master_dataset",
    "weather_to_df",
]
