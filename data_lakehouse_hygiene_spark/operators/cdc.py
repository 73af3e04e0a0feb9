"""Change-data-capture operators: changelog application and SCD type-2
history construction.

The reference's serving loads are full refreshes (``if_exists="replace"``,
``/root/reference/elt/load/load_aktivitas_to_neon.py:81-86``) — the
lakehouse-native upgrade is applying an ordered changelog instead of
rewriting the table. These two operators are the batch halves of that
contract (the Delta MERGE writer in ``sinks.merge_upsert`` is the I/O
half):

- ``cdc_apply``: collapse an (insert/update/delete) changelog to the final
  table state — last writer wins per key, a trailing delete removes the
  key.
- ``scd2_history``: turn the same changelog into a type-2 dimension — one
  validity interval per version with ``valid_from``/``valid_to`` and a
  current-row flag.

Scale design:
- ``cdc_apply`` is ONE aggregate: ``max(struct(ts, tiebreak,
  payload...))`` per key. Struct comparison is lexicographic, so the max
  carries the whole latest row. Spark plans a SortAggregate (struct
  buffers are not hash-aggregable) — but it is still PARTIAL-aggregated,
  so every map partition shrinks to one row per key before the single
  shuffle, and the sort is per-partition on the grouping key, never
  global. Skewed keys degrade gracefully for the same reason.
- ``scd2_history`` needs the per-key order, so it is the canonical
  KEY-PARTITIONED window (never a global one): one shuffle by key, one
  in-partition sort; versions-per-key is bounded by the changelog's churn
  rate, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cdc_apply(
    changes: DataFrame,
    *,
    key: str,
    ts: str,
    delete_pred: Column,
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Final state after applying the changelog in (ts, tiebreak) order.

    Each key's surviving row is the payload of its latest change; keys
    whose latest change satisfies ``delete_pred`` are absent from the
    output. Exactly one shuffle (the groupBy); the struct max replaces the
    row_number()-over-window formulation, which would shuffle the full
    changelog instead of one pre-combined row per key per partition.
    """
    packed = F.struct(
        F.col(ts).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        delete_pred.alias("__del"),
        *[F.col(c).alias(c) for c in payload],
    )
    latest = changes.groupBy(key).agg(F.max(packed).alias("__last"))
    out = latest.where(~F.col("__last.__del")).select(
        key,
        F.col("__last.__ts").alias("last_ts"),
        *[F.col(f"__last.{c}").alias(c) for c in payload],
    )
    return out


def scd2_history(
    changes: DataFrame,
    *,
    key: str,
    ts: str,
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Type-2 dimension history: one row per change with its validity
    interval. ``valid_to`` is the next change's timestamp (NULL while
    current); ``version`` is 1-based per key in change order."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    return changes.select(
        key,
        *payload,
        F.col(ts).alias("valid_from"),
        F.lead(F.col(ts)).over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())
