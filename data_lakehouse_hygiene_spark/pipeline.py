"""The medallion pipeline driver — the engine's equivalent of the
reference's ``run_pipeline.py`` (sequential ingest → clean → curate →
serve, ``/root/reference/run_pipeline.py:25-91``) and of both Airflow DAGs
(``dags/hygiene_dag.py``), collapsed into one Spark job graph.

Zones map to directories of Parquet (Delta when available — ``sinks``):
    raw      append log partitioned by ingest_ts   (was: timestamped objects)
    clean    typed, coerced, null-filtered tables  (was: Delta overwrite)
    curated  the 1-row prescriptive result         (was: Delta + CSV log)
    serving  projected dashboard tables            (was: Postgres replace)

Each stage boundary is a materialized table — the reference's
"IR = zones" checkpoint pattern — so stages are independently rerunnable
and testable. Orchestration (cron/Airflow) stays external, exactly as in
the reference; ``run_pipeline`` is one idempotent run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sinks
from .operators import cleaning, scoring
from .schemas import load_table
from .sources import latest_ingest


def ingest(spark: SparkSession, sf_dir: str, lake: str, ingest_ts: str) -> None:
    """Raw zone: land events + dims as an append log stamped with the run's
    ingest_ts (replaces filename-timestamp versioning, SURVEY.md S4)."""
    for name in ("events", "customer"):
        sinks.append_snapshot(
            load_table(spark, sf_dir, name), f"{lake}/raw/{name}", ingest_ts
        )


def clean(spark: SparkSession, lake: str) -> None:
    """Clean zone: latest snapshot of each raw log, normalized + coerced +
    null-filtered, overwritten (the reference's full-refresh semantics)."""
    ev = latest_ingest(sinks.read_table(spark, f"{lake}/raw/events")).drop(
        "ingest_ts"
    )
    ev = cleaning.drop_null_rows(ev, ["ts"])
    sinks.overwrite_table(cleaning.normalize_columns(ev), f"{lake}/clean/events")

    cust = latest_ingest(sinks.read_table(spark, f"{lake}/raw/customer")).drop(
        "ingest_ts"
    )
    sinks.overwrite_table(
        cleaning.normalize_columns(cust), f"{lake}/clean/customer"
    )


def curate(spark: SparkSession, lake: str, as_of: str | None = None) -> DataFrame:
    """Curated zone: the 1-row prescriptive hygiene result appended to the
    run history (the reference appends hourly,
    ``load_prescriptive_to_sql.py:51-56``).

    ``as_of`` stamps ``generated_at`` deterministically (SURVEY §4.2 rule
    1: everything time-dependent takes ``as_of``) — reruns with the same
    inputs and stamp are bit-identical. ``None`` falls back to wall-clock
    for interactive use."""
    ev = sinks.read_table(spark, f"{lake}/clean/events")
    cust = sinks.read_table(spark, f"{lake}/clean/customer")
    stamp = (
        F.lit(as_of).cast("timestamp")
        if as_of is not None
        else F.current_timestamp()
    )
    result = scoring.hygiene_result_single_source(
        activities=ev,
        dims=cust,
        marker_pred=F.col("event_type") == "signup",
        act_ts="ts",
        act_value="value",
        act_key="user_id",
        dim_key="c_custkey",
        dim_met="c_acctbal",
        dim_category="c_mktsegment",
    ).withColumn("generated_at", stamp)
    result.write.mode("append").parquet(f"{lake}/curated/rekomendasi")
    return result


def serve(spark: SparkSession, lake: str) -> None:
    """Serving zone: projected dashboard tables, full refresh (the
    reference's Postgres ``if_exists='replace'`` loads)."""
    ev = sinks.read_table(spark, f"{lake}/clean/events")
    cust = sinks.read_table(spark, f"{lake}/clean/customer")
    dashboard = cleaning.project(
        ev.join(
            F.broadcast(cust),
            on=ev["user_id"] == cust["c_custkey"],
            how="left",
        ),
        ["event_id", "ts", "event_type", "value", "c_mktsegment"],
    )
    sinks.overwrite_table(dashboard, f"{lake}/serving/riwayat_aktivitas")


def run_pipeline(
    spark: SparkSession, sf_dir: str, lake: str, ingest_ts: str
) -> DataFrame:
    """One full medallion run; returns the curated 1-row result. The run's
    ``ingest_ts`` doubles as the deterministic ``as_of`` stamp."""
    ingest(spark, sf_dir, lake, ingest_ts)
    clean(spark, lake)
    result = curate(spark, lake, as_of=ingest_ts)
    serve(spark, lake)
    return result
