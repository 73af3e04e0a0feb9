"""Join operators J1-J4 (SURVEY.md §2.3).

The reference joins are all *left equi-joins of a fact against tiny dims*
(``/root/reference/elt/clean_sql.py:64-69``,
``elt/prescriptive/prescriptive_logic.py:97,122``,
``elt/load/load_aktivitas_to_neon.py:57-61``) plus one scalar-subquery
non-equi filter (Metabase card 43,
``docker/metabase_backup_utf8.sql:11129``).

Scale design: dims are broadcast explicitly — at 100 TB the fact side never
shuffles for these joins (BroadcastHashJoin, no exchange on the big side).
The scalar-subquery window is an aggregate + broadcast of a 1-row relation,
NOT a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """J1/J2/J3: left equi-join with an explicitly broadcast dim.

    ``broadcast()`` pins BroadcastHashJoinExec regardless of
    autoBroadcastJoinThreshold — the fact side keeps its partitioning and no
    shuffle exchange is introduced.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def scalar_max(df: DataFrame, col: str) -> Column:
    """A1 helper: global MAX as a 1-row aggregate (map-side partial + single
    reduce), never ``orderBy().limit(1)`` (a global sort)."""
    return F.max(F.col(col))


def window_after_event(
    facts: DataFrame, markers: DataFrame, fact_ts: str, marker_ts: str
) -> DataFrame:
    """P8+J4: rows of ``facts`` strictly after the latest marker event.

    Reference: ``catatan[catatan.timestamp > waktu_mandi_terakhir]``
    (``prescriptive_logic.py:90``) and the dashboard's scalar subquery
    ``WHERE ts > (SELECT MAX(waktu_mandi) FROM riwayat_mandi)``
    (``metabase_backup_utf8.sql:11129``).

    Implemented as a cross-join against the 1-row aggregate — Catalyst turns
    this into a broadcast nested-loop over a single row, i.e. the marker is
    computed once and streamed against every fact partition; no driver
    ``collect()`` round-trip, so the whole thing stays one job and is safe to
    compose lazily.
    """
    cutoff = markers.agg(F.max(F.col(marker_ts)).alias("__cutoff"))
    return (
        facts.join(F.broadcast(cutoff))
        .where(F.col(fact_ts) > F.col("__cutoff"))
        .drop("__cutoff")
    )


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of two LARGE tables (neither broadcastable):
    the fact side gets a deterministic salt, the other side is replicated
    once per salt value, and the join key becomes (key, salt) — a hot key's
    rows spread over ``salt_buckets`` reducers instead of one.

    Results are identical to the plain join; only the shuffle distribution
    changes. Salt is a hash of the fact row (retry-safe, no rand()).
    Replication multiplies the other side ×salt_buckets — use only when a
    skewed key actually exists and AQE's skew-join split is insufficient.
    """
    from pyspark.sql import functions as F

    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)
    )
    f = fact.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return f.join(o, on=[on, "__salt"], how=how).drop("__salt")
