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


def test_run_stage_retry_then_success():
    """Flaky stage succeeds on the retry; delay honored via injected
    sleep (the reference policy: 1 retry, fixed delay)."""
    from data_lakehouse_hygiene_spark.pipeline import run_stage

    calls, delays = [], []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("transient")
        return "ok"

    got = run_stage("clean", flaky, retries=1, retry_delay_s=300,
                    sleep=delays.append)
    assert got == "ok"
    assert len(calls) == 2
    assert delays == [300]


def test_run_stage_exhausted_fails_fast():
    """Retries exhausted -> the stage error propagates (fail-fast), named."""
    import pytest
    from data_lakehouse_hygiene_spark.pipeline import run_stage

    def dead():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError) as ei:
        run_stage("ingest", dead, retries=1, retry_delay_s=0,
                  sleep=lambda _: None)
    assert "permanent" in str(ei.value)
    notes = getattr(ei.value, "__notes__", [])
    assert any("ingest" in n for n in notes)


def test_run_pipeline_with_policy_end_to_end(spark, tmp_path):
    """Policy wrapper produces the same curated result as the plain run."""
    from data_lakehouse_hygiene_spark.pipeline import run_pipeline_with_policy

    lake = str(tmp_path / "lake")
    out = run_pipeline_with_policy(
        spark, "/root/testdata/sf0.001", lake, "2026-01-02T03:04:05",
        retries=0,
    )
    rows = out.collect()
    assert len(rows) == 1
