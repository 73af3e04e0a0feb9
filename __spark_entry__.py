"""Driver contract for the spark-graft builder (PySpark target).

Every declared operator from SURVEY.md §2 is one entry in ``_REGISTRY``:
``name -> (spark_callable, oracle_sql_or_None)``. The Spark side and its
DuckDB oracle are written together so the parity contract (identical column
names, identical deterministic numerics) is visible in one place.

Numeric-parity rules used throughout (see
``data_lakehouse_hygiene_spark.operators.aggregates``):
- fractional-double aggregates go through DECIMAL (exact, order-independent),
- integer-valued doubles sum exactly in binary FP,
- per-row rounding uses ``floor(x*p+0.5)/p`` which is bit-identical across
  engines (unlike ``round`` on doubles),
- DuckDB ``SUM(int)`` returns HUGEINT → always ``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lakehouse_hygiene_spark.operators import (  # noqa: E402
    aggregates as agg_ops,
)
from data_lakehouse_hygiene_spark.operators import cleaning, joins, ordering  # noqa: E402
from data_lakehouse_hygiene_spark.operators import scoring  # noqa: E402
from data_lakehouse_hygiene_spark.operators.aggregates import (  # noqa: E402
    exact_avg,
    exact_sum,
    quantize,
)
from data_lakehouse_hygiene_spark.schemas import load_table  # noqa: E402
from data_lakehouse_hygiene_spark.session import pin_session  # noqa: E402

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Core reference-parity operators (SURVEY.md §2.1-2.5, §2.7)
# ---------------------------------------------------------------------------


def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: per-group latest rows (argmax ts per event_type)."""
    return ordering.latest_snapshot(_t(spark, sf_dir, "events"), "event_type", "ts")


SQL_LATEST_SNAPSHOT = """
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props
FROM events e
JOIN (SELECT event_type, max(ts) AS __mx FROM events GROUP BY event_type) m
  ON e.event_type = m.event_type AND e.ts = m.__mx
"""


def q_normalize_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: lower_snake_case column normalization (metadata-only op)."""
    messy = _t(spark, sf_dir, "lineitem").toDF(
        "L_OrderKey",
        " L_PartKey",
        "l_suppkey",
        "L_LineNumber ",
        "L Quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "L_SHIPDATE",
    )
    return cleaning.normalize_columns(messy).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


SQL_NORMALIZE_COLUMNS = """
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
"""


def q_cast_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: coerce-to-NULL timestamp casts (good string parses, garbage → NULL)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_to_timestamp(
            F.date_format("ts", TS_FMT_SPARK), F.lit(TS_FMT_SPARK)
        ).alias("ts_parsed"),
        F.try_to_timestamp(F.col("event_type")).alias("ts_garbage"),
    )


SQL_CAST_TIMESTAMP = f"""
SELECT event_id,
       try_cast(strftime(ts, '{TS_FMT_DUCK}') AS TIMESTAMP) AS ts_parsed,
       try_cast(event_type AS TIMESTAMP) AS ts_garbage
FROM events
"""


def q_cast_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: coerce-to-NULL numeric casts."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").try_cast("double").alias("num_garbage"),
        F.col("n_chars").cast("string").try_cast("double").alias("num_roundtrip"),
    )


SQL_CAST_NUMERIC = """
SELECT doc_id,
       try_cast(lang AS DOUBLE) AS num_garbage,
       try_cast(CAST(n_chars AS VARCHAR) AS DOUBLE) AS num_roundtrip
FROM documents
"""


def q_drop_null_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: coerce then drop rows with NULL required timestamp."""
    ev = _t(spark, sf_dir, "events")
    coerced = ev.withColumn(
        "ts_clean",
        F.try_to_timestamp(
            F.when(F.col("event_type") == "error", F.lit("not-a-time")).otherwise(
                F.date_format("ts", TS_FMT_SPARK)
            ),
            F.lit(TS_FMT_SPARK),
        ),
    )
    return cleaning.drop_null_rows(coerced, ["ts_clean"]).select(
        "event_id", "ts_clean", "event_type"
    )


SQL_DROP_NULL_TS = f"""
SELECT event_id,
       try_cast(CASE WHEN event_type = 'error' THEN 'not-a-time'
                     ELSE strftime(ts, '{TS_FMT_DUCK}') END AS TIMESTAMP) AS ts_clean,
       event_type
FROM events
WHERE try_cast(CASE WHEN event_type = 'error' THEN 'not-a-time'
                    ELSE strftime(ts, '{TS_FMT_DUCK}') END AS TIMESTAMP) IS NOT NULL
"""


def q_flatten_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: JSON path extraction from a string payload column."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k"),
    )


SQL_FLATTEN_JSON = """
SELECT event_id, try_cast(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""


def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6b: array flatten (explode) — the BMKG nested-array pattern applied
    to whitespace tokens."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


SQL_EXPLODE_TOKENS = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
"""


def q_project_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: serving projection → ReadSchema prunes to exactly these columns."""
    return cleaning.project(
        _t(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"],
    )


SQL_PROJECT_SERVING = SQL_NORMALIZE_COLUMNS


def q_window_after_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: facts strictly after the latest marker event (broadcast 1-row agg)."""
    ev = _t(spark, sf_dir, "events")
    markers = ev.where(F.col("event_type") == "signup")
    return joins.window_after_event(ev, markers, "ts", "ts")


SQL_WINDOW_AFTER_EVENT = """
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props
FROM events e
WHERE e.ts > (SELECT max(ts) FROM events WHERE event_type = 'signup')
"""


def q_sweaty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: the de-UDF'd compound predicate (metric OR label-contains)."""
    part = _t(spark, sf_dir, "part")
    pred = cleaning.compound_predicate(
        F.col("p_size").cast("double"), 30.0, F.col("p_type"), "econ"
    )
    return part.where(pred).select("p_partkey", "p_name", "p_type", "p_size")


SQL_SWEATY_FILTER = """
SELECT p_partkey, p_name, p_type, p_size
FROM part
WHERE CAST(p_size AS DOUBLE) > 30.0 OR contains(lower(p_type), 'econ')
"""


def q_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: dim ⟕ dim broadcast left equi-join (nation ⟕ region)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").withColumnRenamed(
        "r_regionkey", "n_regionkey"
    )
    return joins.dim_join(nation, region, on="n_regionkey").select(
        "n_nationkey", "n_name", "r_name"
    )


SQL_DIM_JOIN = """
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def q_fact_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3: fact ⟕ broadcast dim — the fact side never shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    return joins.dim_join(li, part, on="l_partkey").select(
        "l_orderkey", "l_linenumber", "l_quantity", "p_brand", "p_type"
    )


SQL_FACT_DIM_JOIN = """
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, p.p_brand, p.p_type
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
"""


def q_since_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: scalar-subquery non-equi filter, written as SQL so Catalyst's
    subquery handling (broadcast of the 1-row aggregate) is exercised
    end-to-end (Metabase card 43)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderdate, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders
                             WHERE o_orderstatus = 'F')
        """
    )


SQL_SINCE_LAST_EVENT = """
SELECT o_orderkey, o_orderdate, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders WHERE o_orderstatus = 'F')
"""


def q_global_max_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global MAX/MIN as 1-row aggregates (never sort+limit)."""
    ev = _t(spark, sf_dir, "events").agg(
        F.max("ts").alias("max_ts"), F.min("ts").alias("min_ts")
    )
    li = _t(spark, sf_dir, "lineitem").agg(
        F.max("l_shipdate").alias("max_ship"), F.min("l_shipdate").alias("min_ship")
    )
    return ev.join(F.broadcast(li))


SQL_GLOBAL_MAX_MIN = """
SELECT e.max_ts, e.min_ts, l.max_ship, l.min_ship
FROM (SELECT max(ts) AS max_ts, min(ts) AS min_ts FROM events) e
CROSS JOIN (SELECT max(l_shipdate) AS max_ship, min(l_shipdate) AS min_ship
            FROM lineitem) l
"""


def q_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: global SUM — integer-valued doubles exactly, fractional via DECIMAL."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum("l_quantity").alias("sum_qty"),
        exact_sum("l_extendedprice").alias("sum_price"),
    )


SQL_GLOBAL_SUM = """
SELECT SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
"""


def q_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: COUNT(*) and COUNT(col)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"), F.count("l_shipdate").alias("n_ship")
    )


SQL_GLOBAL_COUNT = """
SELECT COUNT(*) AS n_rows, COUNT(l_shipdate) AS n_ship FROM lineitem
"""


def q_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: global AVG via exact decimal sum / count (order-independent)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        exact_avg("l_quantity").alias("avg_qty"),
        exact_avg("l_extendedprice").alias("avg_price"),
    )


SQL_GLOBAL_AVG = """
SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)
           AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(l_extendedprice) AS avg_price
FROM lineitem
"""


def q_conditional_agg_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: ROUND(100*SUM(CASE WHEN … LIKE)/COUNT, 2) (card 54)."""
    orders = _t(spark, sf_dir, "orders")
    return agg_ops.conditional_pct(
        orders, F.col("o_orderpriority").like("1-%"), "pct_urgent"
    )


SQL_CONDITIONAL_AGG_PCT = """
SELECT floor((100.0 * CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0
       AS pct_urgent
FROM orders
"""


def q_group_count_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: frequency distribution (card 51)."""
    return agg_ops.group_count_ordered(
        _t(spark, sf_dir, "orders"), "o_orderstatus", "total"
    )


SQL_GROUP_COUNT_ORDERED = """
SELECT o_orderstatus, COUNT(*) AS total
FROM orders GROUP BY o_orderstatus ORDER BY total DESC, o_orderstatus
"""


def q_time_bucket_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: DATE_TRUNC bucketing + deterministic AVG (cards 41/45/58)."""
    ev = _t(spark, sf_dir, "events")
    return agg_ops.time_bucket_agg(
        ev,
        "ts",
        "hour",
        {"avg_value": exact_avg("value"), "n": F.count(F.lit(1))},
    )


SQL_TIME_BUCKET_AVG = """
SELECT date_trunc('hour', ts) AS bucket,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
       COUNT(*) AS n
FROM events GROUP BY date_trunc('hour', ts)
"""


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: exact COUNT(DISTINCT); at 100 TB flip ``approx=True`` (HLL)."""
    return agg_ops.distinct_count(
        _t(spark, sf_dir, "orders"), "o_custkey", "n_customers"
    )


SQL_DISTINCT_COUNT = """
SELECT COUNT(DISTINCT o_custkey) AS n_customers FROM orders
"""


def q_case_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: CASE-ladder classification + distribution over the labels."""
    orders = _t(spark, sf_dir, "orders")
    label = (
        F.when(F.col("o_totalprice") >= 300000.0, F.lit(scoring.LABEL_NOW))
        .when(F.col("o_totalprice") >= 200000.0, F.lit(scoring.LABEL_RECOMMENDED))
        .when(F.col("o_totalprice") >= 100000.0, F.lit(scoring.LABEL_DEFER))
        .otherwise(F.lit(scoring.LABEL_NONE))
    )
    return agg_ops.group_count_ordered(
        orders.withColumn("rekomendasi", label).select("rekomendasi"),
        "rekomendasi",
        "total",
    )


SQL_CASE_CLASSIFY = f"""
SELECT CASE WHEN o_totalprice >= 300000.0 THEN '{scoring.LABEL_NOW}'
            WHEN o_totalprice >= 200000.0 THEN '{scoring.LABEL_RECOMMENDED}'
            WHEN o_totalprice >= 100000.0 THEN '{scoring.LABEL_DEFER}'
            ELSE '{scoring.LABEL_NONE}' END AS rekomendasi,
       COUNT(*) AS total
FROM orders GROUP BY 1 ORDER BY total DESC, rekomendasi
"""


def q_full_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O3: total-order sort + LIMIT on a unique key (deterministic prefix)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ordering.full_sort(ev, "event_id")
        .limit(100)
        .select("event_id", "ts", "event_type", "value")
    )


SQL_FULL_SORT = """
SELECT event_id, ts, event_type, value
FROM events ORDER BY event_id LIMIT 100
"""


def q_latest_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: rows at the global max timestamp (aggregate, not sort+limit)."""
    return ordering.latest_rows(_t(spark, sf_dir, "events"), "ts").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


SQL_LATEST_ROW = """
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE ts = (SELECT max(ts) FROM events)
"""


def q_hygiene_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+A9+A10: the flagship prescriptive hygiene score, mapped onto the
    driver fixtures (events = activity log, 'signup' = marker/shower events,
    customer = activity master dim, events.value = env readings)."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return scoring.hygiene_result_single_source(
        activities=ev,
        dims=cust,
        marker_pred=F.col("event_type") == "signup",
        act_ts="ts",
        act_value="value",
        act_key="user_id",
        dim_key="c_custkey",
        dim_met="c_acctbal",
        dim_category="c_mktsegment",
    )


SQL_HYGIENE_SCORE = f"""
WITH clock AS (SELECT max(ts) AS now_ts FROM events),
marker AS (SELECT max(ts) AS last_ts FROM events WHERE event_type = 'signup'),
win AS (SELECT e.* FROM events e, marker m WHERE e.ts > m.last_ts),
joined AS (
  SELECT w.*, c.c_acctbal, c.c_mktsegment
  FROM win w LEFT JOIN customer c ON w.user_id = c.c_custkey),
agg AS (
  SELECT
    CAST(SUM(CAST(
      floor((CASE WHEN contains(lower(c_mktsegment), 'outdoor')
                    OR contains(lower(c_mktsegment), 'building')
                  THEN (value * ((c_acctbal / 1000.0) / 10.0)) * 1.5
                  ELSE value * ((c_acctbal / 1000.0) / 10.0) END) * 100.0 + 0.5)
      / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_score,
    CAST(SUM(CASE WHEN c_acctbal > 5000.0
                    OR contains(lower(c_mktsegment), 'building')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sweaty,
    COUNT(*) AS n_acts
  FROM joined),
env AS (
  SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS env_sum,
         COUNT(*) AS env_n
  FROM events),
raw AS (
  SELECT m.last_ts,
         date_diff('second', m.last_ts, c.now_ts) / 3600.0 AS jam0,
         least(a.sum_score / 15.0, 10.0) AS kotor0,
         least(CAST(a.n_sweaty AS DOUBLE)
               * greatest(1.0, (e.env_sum / e.env_n) / 100.0) / 2.0, 10.0) AS bau0,
         least((e.env_sum / e.env_n) / 50.0, 10.0) AS aqi0,
         a.n_acts
  FROM agg a, clock c, marker m, env e),
q AS (
  SELECT last_ts,
         floor(jam0 * 100.0 + 0.5) / 100.0 AS jam_sejak_mandi,
         floor(kotor0 * 100.0 + 0.5) / 100.0 AS skor_kekotoran,
         floor(bau0 * 100.0 + 0.5) / 100.0 AS skor_bau,
         floor(aqi0 * 100.0 + 0.5) / 100.0 AS skor_aqi,
         floor((0.4 * kotor0 + 0.4 * bau0 + 0.2 * aqi0) * 100.0 + 0.5) / 100.0
           AS skor_final,
         n_acts
  FROM raw)
SELECT last_ts AS waktu_mandi_terakhir,
       jam_sejak_mandi, skor_kekotoran, skor_bau, skor_aqi, skor_final,
       CASE WHEN skor_bau >= 9.0 THEN '{scoring.LABEL_ODOR}'
            WHEN skor_final >= 6.0 THEN '{scoring.LABEL_NOW}'
            WHEN skor_final >= 5.0 THEN '{scoring.LABEL_RECOMMENDED}'
            WHEN skor_final >= 4.0 THEN '{scoring.LABEL_DEFER}'
            ELSE '{scoring.LABEL_NONE}' END AS rekomendasi,
       n_acts AS jumlah_aktivitas
FROM q
"""


# ---------------------------------------------------------------------------
# Registry / driver contract
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "latest_snapshot": (q_latest_snapshot, SQL_LATEST_SNAPSHOT),
    "normalize_columns": (q_normalize_columns, SQL_NORMALIZE_COLUMNS),
    "cast_timestamp": (q_cast_timestamp, SQL_CAST_TIMESTAMP),
    "cast_numeric": (q_cast_numeric, SQL_CAST_NUMERIC),
    "drop_null_ts": (q_drop_null_ts, SQL_DROP_NULL_TS),
    "flatten_json": (q_flatten_json, SQL_FLATTEN_JSON),
    "explode_tokens": (q_explode_tokens, SQL_EXPLODE_TOKENS),
    "project_serving": (q_project_serving, SQL_PROJECT_SERVING),
    "window_after_event": (q_window_after_event, SQL_WINDOW_AFTER_EVENT),
    "sweaty_filter": (q_sweaty_filter, SQL_SWEATY_FILTER),
    "dim_join": (q_dim_join, SQL_DIM_JOIN),
    "fact_dim_join": (q_fact_dim_join, SQL_FACT_DIM_JOIN),
    "since_last_event": (q_since_last_event, SQL_SINCE_LAST_EVENT),
    "global_max_min": (q_global_max_min, SQL_GLOBAL_MAX_MIN),
    "global_sum": (q_global_sum, SQL_GLOBAL_SUM),
    "global_count": (q_global_count, SQL_GLOBAL_COUNT),
    "global_avg": (q_global_avg, SQL_GLOBAL_AVG),
    "conditional_agg_pct": (q_conditional_agg_pct, SQL_CONDITIONAL_AGG_PCT),
    "group_count_ordered": (q_group_count_ordered, SQL_GROUP_COUNT_ORDERED),
    "time_bucket_avg": (q_time_bucket_avg, SQL_TIME_BUCKET_AVG),
    "distinct_count": (q_distinct_count, SQL_DISTINCT_COUNT),
    "case_classify": (q_case_classify, SQL_CASE_CLASSIFY),
    "full_sort": (q_full_sort, SQL_FULL_SORT),
    "latest_row": (q_latest_row, SQL_LATEST_ROW),
    "hygiene_score": (q_hygiene_score, SQL_HYGIENE_SCORE),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_hygiene_score(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
