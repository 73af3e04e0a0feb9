"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line:
    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "duckdb_total": N, "sf": 0.1}

The line is kept COMPACT on purpose: the driver records only the last
2000 characters of stdout, and the per-query DuckDB timing / ratio dicts
pushed round 3's line past that window, truncating its head so the round
recorded no parsed bench at all. Full per-query DuckDB timings and
Spark/DuckDB ratios now go to BENCH_DETAIL.json next to this script.

Each query is forced end-to-end with the `noop` datasource sink (full
computation on executors, no driver collect / toPandas overhead), which is
what per-query wall time would mean on a real cluster. One warmup pass of a
tiny query amortizes JVM/codegen startup out of the measurements.

The DuckDB column runs each headline query's ORACLE SQL on the same
parquet at the same scale factor (same box, all cores) — a strong
single-node engine as the "within 2×" reference point the reference repo
itself never published. ratio > 1 means Spark is slower; at toy scale the
gap is dominated by Spark's fixed per-query overhead (task scheduling,
codegen), which amortizes away at cluster scale.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_hygiene_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the queries that do
# real distributed work at scale (joins, aggs, dedup, similarity) rather than
# metadata-only projections.
HEADLINE = [
    "hygiene_score",
    "fact_dim_join",
    "since_last_event",
    "group_count_ordered",
    "time_bucket_avg",
    "global_sum",
    "distinct_count",
    "latest_snapshot",
    "full_sort",
    "explode_tokens",
    "minhash_near_dup",
    "simhash_fp",
    "ngram_jaccard",
    "simhash_near_dup",
    "embedding_near_dup",
    "quality_score",
    "cosine_topk",
    "asof_join",
    "sessionize",
    "hash_sample",
    "profile_table",
    "salted_join",
    "unpivot_metrics",
    "rollup_counts",
    "bigram_lm_score",
    "incremental_dedup",
    "topk_per_group",
    "range_join",
    "cdc_apply",
    "gap_fill",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warmup: run the cheapest query once to JIT/codegen-warm the session.
    _force(qs["global_count"](spark, sf_dir))

    # Per query: one untimed warmup (whole-stage-codegen compile + JIT —
    # amortized to nothing on a long-lived cluster), then min of 2 timed
    # runs = steady-state throughput.
    timings: dict[str, float] = {}
    for name in names:
        _force(qs[name](spark, sf_dir))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # DuckDB oracle timings on the same data (warmup + min of 2, matching
    # the Spark protocol; fetchall forces full materialization).
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # Single timed run per oracle: DuckDB has no JIT/codegen warmup to
    # amortize, and the parquet files are already hot in the page cache
    # from the Spark passes. (The embedding oracle is a deliberate
    # brute-force quadratic — ~20 s at sf0.1 — so min-of-2 would double
    # the bench wall time for no signal.)
    oracles = entrymod.oracle_sql()
    duck: dict[str, float] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        duck[name] = round(time.perf_counter() - t0, 3)
    ratio = {
        n: round(timings[n] / duck[n], 2) if duck.get(n) else None
        for n in names
        if n in duck
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "queries": timings,
                "duckdb_sec": duck,
                "ratio_vs_duckdb": ratio,
                "spark_total": total,
                "duckdb_total": round(sum(duck.values()), 3),
                "sf": sf,
            },
            fh,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "duckdb_total": round(sum(duck.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
