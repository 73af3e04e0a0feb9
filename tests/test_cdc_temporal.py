"""Semantic tests for the CDC / range-join / gap-fill / hash-split
operators, independent of the SQL oracle: each asserts the operator's
defining property (containment-equivalence, changelog collapse, timeline
partition, partition-invariance, LOCF carry)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from .conftest import SF_SMOKE

from data_lakehouse_hygiene_spark.operators import cdc, sampling, temporal
from data_lakehouse_hygiene_spark.schemas import load_table


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_range_join_equals_naive_theta(spark):
    """The bucketed equi-join must return exactly the naive theta-join's
    pair set, independent of the bucket width."""
    ev = _events(spark)
    intervals = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 6 HOUR")).alias("end_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    naive = (
        clicks.alias("e")
        .join(
            intervals.alias("i"),
            (F.col("e.user_id") == F.col("i.user_id"))
            & (F.col("e.ts") >= F.col("i.start_ts"))
            & (F.col("e.ts") < F.col("i.end_ts")),
        )
        .select("i.interval_id", "e.event_id")
    )
    for bucket in (600, 3600, 86400):
        got = temporal.range_join(
            clicks, intervals, key="user_id", ts="ts", bucket_seconds=bucket
        ).select("interval_id", "event_id")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive.collect())
        ), f"bucket={bucket}"


def test_cdc_apply_collapse_and_delete(spark):
    rows = [
        # key 1: upsert then delete -> absent
        (1, dt.datetime(2024, 1, 1, 0), "u", 1.0, 10),
        (1, dt.datetime(2024, 1, 2, 0), "d", 2.0, 11),
        # key 2: delete then upsert -> present with last value
        (2, dt.datetime(2024, 1, 1, 0), "d", 3.0, 12),
        (2, dt.datetime(2024, 1, 3, 0), "u", 4.0, 13),
        # key 3: same-ts tie -> higher tiebreak wins
        (3, dt.datetime(2024, 1, 1, 0), "u", 5.0, 14),
        (3, dt.datetime(2024, 1, 1, 0), "u", 6.0, 15),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, op string, v double, seq long")
    out = cdc.cdc_apply(
        df,
        key="k",
        ts="ts",
        delete_pred=F.col("op") == "d",
        payload=["v"],
        tiebreak="seq",
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {2: 4.0, 3: 6.0}


def test_scd2_history_partitions_timeline(spark):
    """valid_to must equal the next version's valid_from; exactly one
    current row per key; versions contiguous from 1."""
    ev = _events(spark).where(F.col("event_type") == "signup")
    hist = cdc.scd2_history(
        ev, key="user_id", ts="ts", payload=["value"], tiebreak="event_id"
    ).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["user_id"], []).append(r)
    assert by_key
    for rows in by_key.values():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_hash_split_partition_invariant_and_total(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    splits = [("train", 80), ("valid", 10), ("test", 10)]
    a = sampling.hash_split(docs, "doc_id", splits)
    b = sampling.hash_split(docs.repartition(13), "doc_id", splits)
    ga = sorted((r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect())
    gb = sorted((r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect())
    assert ga == gb
    assert len(ga) == docs.count()  # every row in exactly one split
    labels = {s for _, s in ga}
    assert labels <= {"train", "valid", "test"}


def test_gap_fill_spine_complete_and_locf(spark):
    ev = _events(spark)
    avg_exact = (
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        / F.count(F.lit(1))
    )
    out = temporal.gap_fill(
        ev, key="event_type", ts="ts", value_agg=avg_exact, bucket="hour"
    ).collect()
    by_key: dict[str, list] = {}
    for r in out:
        by_key.setdefault(r["event_type"], []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r["bucket"])
        # spine is contiguous hours
        for a, b in zip(rows, rows[1:]):
            assert (b["bucket"] - a["bucket"]) == dt.timedelta(hours=1)
        # LOCF: synthesized rows repeat the previous filled value
        prev = None
        for r in rows:
            if r["n"] == 0:
                assert r["filled"] == prev
            prev = r["filled"]


def test_funnel_conversion_ordered_dropoff(spark):
    """Step reach requires the step event AT OR AFTER the previous reach:
    out-of-order purchases don't count, ties do, drop-off math checks."""
    import datetime as dt

    from data_lakehouse_hygiene_spark.operators.temporal import (
        funnel_conversion,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: full ordered funnel
        (1, 1, "view", t0), (2, 1, "click", t0 + s), (3, 1, "purchase", t0 + 2 * s),
        # u2: purchase BEFORE click — reaches click only
        (4, 2, "view", t0), (5, 2, "purchase", t0 + s), (6, 2, "click", t0 + 2 * s),
        # u3: view only
        (7, 3, "view", t0),
        # u4: click with NO view — never enters the funnel
        (8, 4, "click", t0),
        # u5: click at the SAME ts as view (inclusive) then purchase
        (9, 5, "view", t0), (10, 5, "click", t0), (11, 5, "purchase", t0 + s),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = {r["step"]: (r["n_users"], r["conversion"]) for r in funnel_conversion(df).collect()}
    assert got["view"] == (4, 1.0)       # u1 u2 u3 u5
    assert got["click"] == (3, 0.75)     # u1 u2 u5
    assert got["purchase"] == (2, 0.666667)  # u1 u5 (u2's purchase was early)


def test_cohort_retention_triangle(spark):
    """Known two-cohort triangle: counts per (cohort_week, offset)."""
    import datetime as dt

    from data_lakehouse_hygiene_spark.operators.temporal import (
        cohort_retention,
    )

    wk = dt.timedelta(days=7)
    w0 = dt.datetime(2024, 1, 4)  # all within one epoch week bucket
    rows = [
        (1, 10, "x", w0), (2, 10, "x", w0 + wk),      # u10: weeks 0,1
        (3, 11, "x", w0),                              # u11: week 0 only
        (4, 12, "x", w0 + wk), (5, 12, "x", w0 + 2 * wk),  # u12: cohort w+1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = {
        (r["week_offset"],): r["n_users"]
        for r in cohort_retention(df).groupBy("week_offset")
        .sum("n_users")
        .withColumnRenamed("sum(n_users)", "n_users")
        .collect()
    }
    # offsets: u10 {0,1}, u11 {0}, u12 {0,1} → offset0: 3 users, offset1: 2
    assert got[(0,)] == 3 and got[(1,)] == 2
