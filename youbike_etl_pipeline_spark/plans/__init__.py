"""Named query corpus — the engine's SURVEY §2 coverage, wired into
``__spark_entry__.py`` for the driver's DuckDB-oracle correctness gate."""

from .corpus import CORPUS, QuerySpec, entry_query, oracle_sql, queries

__all__ = ["CORPUS", "QuerySpec", "entry_query", "oracle_sql", "queries"]
