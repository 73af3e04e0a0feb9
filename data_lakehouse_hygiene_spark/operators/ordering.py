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


def global_rank(
    df: DataFrame,
    *order_cols: str,
    rank_col: str = "rank",
    n_buckets: int | None = None,
) -> tuple[DataFrame, int]:
    """Scale-safe global ``row_number`` over a total order — the distributed
    replacement for ``Window.orderBy(...)`` with no partition key (which
    funnels the whole table through ONE task).

    Two-phase: (0) split the first sort column's value domain into
    ``n_buckets`` ordered ranges via approximate percentiles (balance-only;
    rows equal to a cut all land in the same bucket, so bucket order is
    monotone in the sort order); (1) a tiny per-bucket count aggregate gives
    each bucket's starting offset on the driver; (2) rank = offset +
    per-bucket ``row_number`` (PARTITIONED window, embarrassingly parallel).

    The first sort column must be percentile-able (numeric / temporal).
    Returns ``(df_with_rank, total_rows)`` — the total is a free by-product
    of the offset pass.
    """
    from functools import reduce
    from operator import add

    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    first = order_cols[0]
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts: list = []
    if probs:
        row = df.select(
            F.percentile_approx(first, probs, 10000).alias("c")
        ).first()
        cuts = sorted(set(row["c"] or []))
    bkt = reduce(
        add, [(F.col(first) > F.lit(c)).cast("int") for c in cuts], F.lit(0)
    )
    bucketed = df.withColumn("__bkt", bkt)
    counts = {
        r["__bkt"]: r["n"]
        for r in bucketed.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in range(len(cuts) + 1):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_map = F.create_map(
        *[F.lit(x) for b, o in offsets.items() for x in (b, o)]
    )
    w = Window.partitionBy("__bkt").orderBy(*[F.asc(c) for c in order_cols])
    ranked = bucketed.withColumn(
        rank_col,
        F.element_at(off_map, F.col("__bkt")).cast("bigint")
        + F.row_number().over(w),
    ).drop("__bkt")
    return ranked, acc


def global_ntile(
    df: DataFrame, n_tiles: int, *order_cols: str, tile_col: str = "tile"
) -> DataFrame:
    """Scale-safe ``NTILE(n)`` over a total order, built on ``global_rank``
    instead of a single-partition global window.

    Reproduces SQL NTILE's exact bucket-size rule (the first ``n mod k``
    tiles get one extra row) from the global rank: with ``base = n // k``
    and ``rem = n % k``, rank r maps to ``ceil(r / (base+1))`` inside the
    first ``rem*(base+1)`` rows and ``rem + ceil((r - rem*(base+1)) / base)``
    after. Output type matches Spark's ``ntile`` (int)."""
    ranked, n = global_rank(df, *order_cols, rank_col="__rank")
    base, rem = divmod(n, n_tiles)
    r = F.col("__rank")
    if base == 0:
        tile = r
    else:
        head = rem * (base + 1)
        in_tail = F.lit(rem) + F.ceil(
            (r - F.lit(head)).cast("double") / F.lit(base)
        )
        if rem:
            in_head = F.ceil(r.cast("double") / F.lit(base + 1))
            tile = F.when(r <= F.lit(head), in_head).otherwise(in_tail)
        else:
            tile = in_tail
    return ranked.withColumn(tile_col, tile.cast("int")).drop("__rank")


def top_k_per_group(
    df: DataFrame,
    group: str | list[str],
    order: str,
    k: int,
    tie: str | None = None,
) -> DataFrame:
    """Top-k rows per group via ranked window, rank kept in ``rk``.

    The canonical "best k documents per (lang, source) by quality" selector
    of a curation pipeline. One shuffle on the group key — the window
    partitions BY GROUP (never a global sort), so every group ranks
    independently and AQE splits skewed groups. ``tie`` (ascending) makes
    the cut deterministic when ``order`` values repeat; pass the primary
    key."""
    group = [group] if isinstance(group, str) else group
    ordering = [F.desc(order)] + ([F.asc(tie)] if tie else [])
    w = Window.partitionBy(*group).orderBy(*ordering)
    return df.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
