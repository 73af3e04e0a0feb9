"""data_lakehouse_hygiene_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference lakehouse (``Andra-Braputra/data-lakehouse-hygiene``), re-expressed
idiomatically on the Spark DataFrame/SQL stack (Catalyst-optimized, AQE,
broadcast joins, whole-stage codegen) instead of single-node pandas.

Layout
------
- ``session``   — SparkSession factory with pinned timezone / shuffle config.
- ``schemas``   — explicit StructTypes for every input table (no inference).
- ``operators`` — the full operator inventory from SURVEY.md §2:
  cleaning, joins, aggregates, ordering, scoring, nested-JSON, plus the
  LLM-data-pipeline extensions (dedup, similarity, text, multimodal).
- ``sources``   — readers: parquet/CSV/JSON with explicit schemas, fail-soft
  reads, append-log snapshots with ``latest_snapshot`` pruning.
- ``sinks``     — overwrite/append table writers (parquet; Delta when the
  delta-spark package is present).
- ``streaming`` — Structured Streaming upgrade of the reference's hourly
  batch cadence.
"""

__version__ = "0.1.0"
