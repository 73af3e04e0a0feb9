"""Lakehouse-maintenance utilities: compaction, schema drift."""

from __future__ import annotations

import glob
import tempfile

from .conftest import SF_SMOKE

from data_lakehouse_hygiene_spark import maintenance
from data_lakehouse_hygiene_spark.schemas import load_table


def test_compact_small_files(spark):
    df = load_table(spark, SF_SMOKE, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_tbl"
        # Simulate a small-file problem: 16 files for a tiny table.
        df.repartition(16).write.parquet(path)
        assert len(glob.glob(f"{path}/part-*.parquet")) == 16
        maintenance.compact_small_files(spark, path, target_files=2)
        assert len(glob.glob(f"{path}/part-*.parquet")) == 2
        back = spark.read.parquet(path)
        assert back.count() == df.count()


def test_schema_drift(spark):
    a = load_table(spark, SF_SMOKE, "orders")
    b = a.drop("o_orderpriority").withColumn(
        "o_totalprice", a["o_totalprice"].cast("string")
    )
    drift = maintenance.schema_drift(a, b.select("*"))
    kinds = {(d["column"], d["kind"]) for d in drift}
    assert ("o_orderpriority", "removed") in kinds
    assert ("o_totalprice", "retyped") in kinds
    assert maintenance.schema_drift(a, a) == []
