"""Coverage for utility surfaces not exercised by the oracle suite:
json_ops parsing helpers, the CSV log sink, and a sessionize property
check against a pure-Python reference."""

from __future__ import annotations

import csv
import glob
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .conftest import SF_SMOKE

from data_lakehouse_hygiene_spark import sinks
from data_lakehouse_hygiene_spark.operators import json_ops, temporal
from data_lakehouse_hygiene_spark.schemas import load_table


def test_parse_json_col_malformed_to_null(spark):
    schema = StructType(
        [StructField("a", DoubleType()), StructField("b", StringType())]
    )
    df = spark.createDataFrame(
        [('{"a": 1.5, "b": "x"}',), ("not json at all",), (None,)],
        ["payload"],
    )
    out = json_ops.parse_json_col(df, "payload", schema, "parsed").select(
        "parsed.a", "parsed.b"
    )
    rows = [tuple(r) for r in out.collect()]
    assert (1.5, "x") in rows
    assert rows.count((None, None)) == 2  # malformed AND null both coerce


def test_explode_levels_two_deep(spark):
    schema = StructType(
        [StructField("outer", ArrayType(ArrayType(StringType())))]
    )
    df = spark.createDataFrame([([["a", "b"], ["c"]],)], schema)
    out = json_ops.explode_levels(df, "outer", "outer_x")
    vals = sorted(r["outer_x_x"] for r in out.collect())
    assert vals == ["a", "b", "c"]


def test_csv_log_single_file(spark):
    df = load_table(spark, SF_SMOKE, "region")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/log"
        sinks.csv_log(df, path)
        files = glob.glob(f"{path}/part-*.csv")
        assert len(files) == 1  # coalesce(1): exactly one CSV part
        with open(files[0]) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["r_regionkey", "r_name"]
        assert len(rows) - 1 == df.count()


def test_sessionize_matches_python_reference(spark):
    """Session ids computed by Spark must equal a straightforward Python
    scan over the same (user-ordered) events."""
    ev = load_table(spark, SF_SMOKE, "events")
    got = {
        r["event_id"]: r["session_id"]
        for r in temporal.sessionize(
            ev, key="user_id", ts="ts", gap_seconds=1800, tiebreak="event_id"
        ).collect()
    }
    rows = sorted(
        ((r["user_id"], r["ts"], r["event_id"]) for r in ev.collect())
    )
    want = {}
    last_ts_by_user: dict = {}
    sess_by_user: dict = {}
    import calendar

    def epoch_s(t):  # truncated-epoch diff == Spark unix_timestamp semantics
        return calendar.timegm(t.timetuple())

    for user, ts, eid in rows:
        prev = last_ts_by_user.get(user)
        if prev is None or epoch_s(ts) - epoch_s(prev) > 1800:
            sess_by_user[user] = sess_by_user.get(user, 0) + 1
        last_ts_by_user[user] = ts
        want[eid] = sess_by_user[user]
    assert got == want
