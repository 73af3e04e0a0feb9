"""Sources S1-S8 (SURVEY.md §2.1), Spark-first.

The reference lands one timestamped object per ingest run into MinIO and
re-finds "the latest" by listing + argmax LastModified
(``/root/reference/elt/clean_sheets.py:42-51``). Our engine replaces the
filename-timestamp convention with an append log partitioned by
``ingest_ts`` — latest-run reads become *partition pruning* (only the max
partition's files are listed/scanned), which is the 100 TB-safe version of
"read the newest object".

HTTP/JDBC ingestion (S1-S3) is driver-side by nature (one small payload per
run); at scale the pattern is land-files-then-``spark.read`` which these
helpers also cover.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    drop_malformed: bool = True,
) -> DataFrame:
    """S2/S6: CSV with declared schema.

    ``mode=DROPMALFORMED`` reproduces the reference's ``on_bad_lines="skip"``
    (``ingestion/sheets/sheets_to_raw.py:49``); Spark strips the UTF-8 BOM
    natively (the reference hand-strips it, ``elt/clean_sheets.py:56``).
    """
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "DROPMALFORMED" if drop_malformed else "PERMISSIVE")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S1-landed JSON files with a declared schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def dataframe_from_payload(
    spark: SparkSession, payload: dict[str, Any] | list[dict[str, Any]], schema: StructType
) -> DataFrame:
    """S1: REST-API JSON payload (driver-side fetch) → typed DataFrame.

    Mirrors ``ingestion/api_bmkg/bmkg_to_raw.py:43-57`` minus the HTTP call;
    the payload is parsed against the declared schema via the JSON reader so
    nested arrays/structs coerce identically to file-landed data.
    """
    rows = payload if isinstance(payload, list) else [payload]
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in rows], 1)
    return spark.read.schema(schema).json(rdd)


def read_jdbc(
    spark: SparkSession, url: str, table: str, *, properties: dict[str, str] | None = None
) -> DataFrame:
    """S3: JDBC dim-table source (``ingestion/sql/sql_to_raw.py:18,36-37``).
    Dims are single-partition reads; facts would add partitionColumn/bounds
    for parallel extraction."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(
        **(properties or {})
    ).load()


def fail_soft(spark: SparkSession, schema: StructType, loader) -> DataFrame:
    """S8: the reference returns an *empty* frame when a zone is missing
    (``elt/prescriptive/prescriptive_logic.py:48-50``) so downstream logic
    degrades instead of crashing. Same contract, typed."""
    try:
        return loader()
    except Exception:
        return spark.createDataFrame([], schema)


def latest_ingest(df: DataFrame, ingest_col: str = "ingest_ts") -> DataFrame:
    """S5 over an append log: max-partition pruning.

    When ``ingest_col`` is the partition column of the log, Catalyst folds
    the broadcast-joined max into partition pruning under AQE (only the
    newest partition's files are scanned).
    """
    mx = df.agg(F.max(F.col(ingest_col)).alias("__mx"))
    return (
        df.join(F.broadcast(mx), on=df[ingest_col] == mx["__mx"], how="inner")
        .drop("__mx")
    )
