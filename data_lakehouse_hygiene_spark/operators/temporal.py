"""Temporal operators Spark lacks as builtins: as-of join and gap-based
sessionization.

The reference approximates "state relative to the latest marker" with a
global scalar (``prescriptive_logic.py:78-90``); these generalize it
per-key, which is what an event pipeline needs at scale.

Scale design:
- ``asof_join`` is the union+window formulation: tag both streams, union,
  and carry the last marker forward with a running ``last(ignoreNulls)``
  window. ONE shuffle (by key) + ONE sort — no range cross-join, no
  per-event probe. This is the standard big-data as-of (Flink/kdb-style)
  shape and scales linearly in events+markers.
- ``sessionize`` is lag + conditional cumulative sum over the same
  (key, ts) window — again one shuffle + one sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    events: DataFrame,
    markers: DataFrame,
    *,
    key: str,
    ts: str,
    marker_ts_out: str = "asof_ts",
) -> DataFrame:
    """For each event row, attach the latest marker timestamp with
    ``marker.ts <= event.ts`` for the same key (inclusive, DuckDB ASOF JOIN
    semantics). Events with no preceding marker get NULL."""
    tagged_e = events.withColumn("__is_marker", F.lit(0)).withColumn(
        "__mts", F.lit(None).cast(events.schema[ts].dataType)
    )
    tagged_m = markers.select(
        key, F.col(ts).alias(ts)
    ).withColumn("__is_marker", F.lit(1)).withColumn("__mts", F.col(ts))
    cols = [c for c in tagged_e.columns]
    unioned = tagged_e.unionByName(
        tagged_m.select(
            *[
                F.col(c) if c in (key, ts, "__is_marker", "__mts") else F.lit(None).alias(c)
                for c in cols
            ]
        ),
        allowMissingColumns=False,
    )
    # At equal ts the marker must precede the event (inclusive join) →
    # descending __is_marker within the ts tie.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_marker").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn(marker_ts_out, F.last("__mts", ignorenulls=True).over(w))
    return out.where(F.col("__is_marker") == 0).drop("__is_marker", "__mts")


def sessionize(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int = 1800,
    session_out: str = "session_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``. Session ids
    are 1-based per key (cumulative sum of session starts)."""
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        session_out, F.sum(is_new).over(running).cast("bigint")
    )
