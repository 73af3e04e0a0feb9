"""Sort / top-1 / limit operators O1-O3 (SURVEY.md §2.5) + latest-snapshot S5.

Reference: full sort after flatten (``/root/reference/elt/clean_bmkg.py:73``),
latest-row top-1 (``elt/prescriptive/prescriptive_logic.py:72-73`` and the
``ORDER BY ... DESC LIMIT 1`` dashboard cards), LIMIT (card 44), and the
"latest object" scan over the raw zone (``elt/clean_sheets.py:42-51``).

Scale design: top-1/latest-row is NEVER a global sort — it's a max-aggregate
(1-row broadcast) semi-joined back, or a per-group window. ``orderBy(...)
.limit(1)`` would sort 100 TB to keep one row; the aggregate form is one
map-reduce over partial maxes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def full_sort(df: DataFrame, *cols: str, desc: bool = False) -> DataFrame:
    """O1: total-order sort (range-partitioned exchange + per-partition sort).
    Only meaningful for serving/export; analytical consumers should rely on
    the order-insensitive result set."""
    ordering = [F.desc(c) if desc else F.asc(c) for c in cols]
    return df.orderBy(*ordering)


def latest_rows(df: DataFrame, ts: str) -> DataFrame:
    """O2: rows carrying the global maximum timestamp.

    Aggregate max → broadcast 1-row relation → equi-filter. Two scans of the
    (column-pruned) ts column beat one global sort by orders of magnitude at
    scale; ties are kept (deterministic under duplicates).
    """
    mx = df.agg(F.max(F.col(ts)).alias("__mx"))
    return df.join(F.broadcast(mx), on=df[ts] == mx["__mx"], how="inner").drop("__mx")


def latest_snapshot(df: DataFrame, group: str, ts: str) -> DataFrame:
    """S5: per-group latest rows ("auto-detect terbaru",
    ``elt/clean_sheets.py:42-51``): for each ``group`` keep the rows with
    that group's max ``ts``.

    Implemented as a grouped max + broadcast join back (the grouped max is
    tiny: one row per source/partition name). With millions of groups,
    switch to the window-function form (single shuffle on group):
    ``row_number() over (partition by group order by ts desc) = 1``.
    """
    mx = df.groupBy(group).agg(F.max(F.col(ts)).alias("__mx"))
    return (
        df.join(F.broadcast(mx), on=[group], how="inner")
        .where(F.col(ts) == F.col("__mx"))
        .drop("__mx")
    )


def top_k_per_group(df: DataFrame, group: str, order: str, k: int) -> DataFrame:
    """Top-k rows per group via ranked window — one shuffle on the group key;
    AQE splits skewed groups."""
    w = Window.partitionBy(group).orderBy(F.desc(order))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
