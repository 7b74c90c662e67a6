"""youbike_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame + Spark SQL) engine providing the
full query and data-processing surface of the reference bike-share analytics
system ``kevinlin000/YouBike-ETL-Pipeline`` (pandas/MySQL/Airflow), re-expressed
Spark-first: schema-first IO, relational operators, time/window operators, a
closed-form distributed statistics layer, pyspark.ml pipelines, and
LLM-data-pipeline extensions (dedup, similarity search, text analysis) designed
partition-aware for 100 TB scale.

Layer map (see SURVEY.md for the per-operator blueprint):

- :mod:`.session`    — SparkSession factory (AQE, UTC, Arrow on)
- :mod:`.schemas`    — explicit StructType schemas (no inference in prod paths)
- :mod:`.sources`    — readers/writers: Parquet/CSV/JSON/JDBC, idempotent sinks
- :mod:`.functions`  — scalar/array column expressions (Haversine, buckets, …)
- :mod:`.operators`  — relational, join, aggregation, window, dedup, similarity,
  text, multimodal operators
- :mod:`.stats`      — sufficient-statistics inference (CI, t-test, ANOVA, χ²)
- :mod:`.ml`         — KMeans profiles, regression suite, feature prep
- :mod:`.plans`      — the named query corpus wired into ``__spark_entry__.py``
- :mod:`.streaming`  — Structured Streaming ingest/dedup/windowed aggregation
- :mod:`.pipelines`  — the reference's four dataflows recomposed on the layers
"""

__version__ = "0.1.0"
