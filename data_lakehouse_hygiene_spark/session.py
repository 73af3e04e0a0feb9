"""SparkSession factory.

The reference pins a timezone by hand (tz-stripping after Delta reads,
``/root/reference/elt/prescriptive/prescriptive_logic.py:43-47`` and faking
WITA local time at ``:57-59``). Our engine pins the *session* timezone once,
here, and treats every stored timestamp as timezone-naive UTC — so results
collected from Spark match a naive-timestamp oracle (DuckDB) bit for bit.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime partition coalescing + skew-join splitting.
- ``spark.sql.shuffle.partitions`` is a *local* default; on a real cluster
  AQE's ``advisoryPartitionSizeInBytes`` governs post-shuffle sizing.
- ANSI mode off: the reference's semantics are coerce-to-NULL
  (``pd.to_numeric(errors="coerce")``); we additionally use try_cast /
  try_to_timestamp everywhere so the operators are correct under either
  ANSI setting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-lakehouse-hygiene-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow transfer granularity for mapInPandas. The default 10k
        # rows/batch is fine for scalar columns but fatal for binary
        # payload columns: the JVM re-batches between CHAINED Python
        # ops at this size, so 10k-row batches of 12 KB media payloads
        # put ~120 MB per task in flight JVM-side (x32 tasks OOM'd a
        # 24 GiB heap at the 500k-doc rehearsal) no matter how small
        # the kernels' own yields are. 1k rows keeps payload batches
        # ~12 MB; the extra per-batch round-trips are noise for scalar
        # workloads (grouped applyInPandas is NOT affected — groups
        # ship whole regardless of this conf).
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_BATCH", "1024"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Keep catalog artifacts (bucketed saveAsTable) out of the repo dir.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-graft-warehouse"),
        )
    )
    return builder.getOrCreate()


def pin_session(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs on a session we did not create.

    The verification driver owns its own SparkSession; correctness of our
    declared queries must not depend on its defaults. Everything set here is
    runtime-configurable (no SparkContext restart needed).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Streaming aggregations bypass AQE's partition coalescing, so an
    # unpinned 200-partition default burns 200 tiny tasks per micro-batch
    # on a driver-owned session; pin to the local core count.
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    # Payload-column Arrow batches must stay small on ANY session that
    # runs the multimodal queries — see the factory comment.
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        os.environ.get("SPARK_ARROW_BATCH", "1024"),
    )
    # Deliberate session-wide pin (not restored): schemas.load_table reads
    # TIMESTAMP(NANOS) parquet columns as raw longs under this flag, and the
    # flag must still be set when the (lazy) scan actually EXECUTES —
    # restoring it right after plan construction would flip behavior mid-
    # query. Effect on the host session: later TIMESTAMP(NANOS) reads yield
    # BIGINT instead of erroring; MILLIS/MICROS columns are unaffected.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
