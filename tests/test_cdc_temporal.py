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
