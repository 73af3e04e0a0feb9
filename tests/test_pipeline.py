"""End-to-end medallion pipeline: raw → clean → curated → serving."""

from __future__ import annotations

import tempfile

import __spark_entry__ as entrymod
from data_lakehouse_hygiene_spark import pipeline, sinks

from .conftest import SF_SMOKE


def test_full_medallion_run(spark):
    with tempfile.TemporaryDirectory() as lake:
        result = pipeline.run_pipeline(
            spark, SF_SMOKE, lake, ingest_ts="2026-01-01T00:00:00"
        )
        row = result.collect()[0]
        # The curated score must equal the flagship query on the same input.
        flagship = entrymod.entry(spark).collect()[0]
        assert tuple(row)[:-1] == tuple(flagship)

        # Serving table exists with the projected schema.
        serving = sinks.read_table(spark, f"{lake}/serving/riwayat_aktivitas")
        assert serving.columns == [
            "event_id",
            "ts",
            "event_type",
            "value",
            "c_mktsegment",
        ]
        assert serving.count() > 0

        # Second run: raw log grows, curated history appends, clean zone
        # still reflects only the latest snapshot (idempotent overwrite).
        pipeline.run_pipeline(
            spark, SF_SMOKE, lake, ingest_ts="2026-01-02T00:00:00"
        )
        raw = sinks.read_table(spark, f"{lake}/raw/events")
        assert raw.select("ingest_ts").distinct().count() == 2
        from data_lakehouse_hygiene_spark.schemas import load_table

        clean_ev = sinks.read_table(spark, f"{lake}/clean/events")
        assert clean_ev.count() == load_table(spark, SF_SMOKE, "events").count()
        history = spark.read.parquet(f"{lake}/curated/rekomendasi")
        assert history.count() == 2


def test_curate_rerun_is_bit_identical(spark):
    """SURVEY §4.2 rule 1: with a fixed as_of stamp, rerunning curate on
    the same inputs yields bit-identical rows (no wall-clock leakage)."""
    with tempfile.TemporaryDirectory() as lake:
        pipeline.ingest(spark, SF_SMOKE, lake, "2026-01-01T00:00:00")
        pipeline.clean(spark, lake)
        r1 = pipeline.curate(spark, lake, as_of="2026-01-01T00:00:00").collect()
        r2 = pipeline.curate(spark, lake, as_of="2026-01-01T00:00:00").collect()
        assert r1 == r2
