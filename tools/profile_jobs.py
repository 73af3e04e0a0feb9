"""Per-query job/stage profiler: how many Spark jobs + stages each
registry query launches end-to-end (noop sink), and wall time.

Each job pays the local-mode scheduling floor; each extra stage is a
shuffle boundary. At sf0.1 the floor dominates, so job count is the
first thing to read when a query's bench gap vs DuckDB is large.

Usage: python tools/profile_jobs.py q1 q2 ...   (default: top bench-gap rows)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_hygiene_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "ngram_jaccard", "simhash_near_dup", "group_heavy_hitters",
    "incremental_near_dup", "ccnet_bucket", "boilerplate_ngrams",
    "substring_dedup", "substring_dedup_apply",
    "substring_dedup_keep_first", "mad_outliers", "heavy_hitters",
    "salted_join", "minhash_near_dup", "line_dedup", "source_dup_stats",
    "bigram_lm_score", "vocab_topk", "shard_assign", "hygiene_score",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()

    def run(name: str) -> tuple[float, int, int]:
        jobs0 = tracker.getJobIdsForGroup(None)
        # job ids are global and monotonically increasing; diff the max
        before = max(jobs0) if jobs0 else -1
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        jobs1 = tracker.getJobIdsForGroup(None)
        new = [j for j in jobs1 if j > before]
        n_stages = 0
        for j in new:
            info = tracker.getJobInfo(j)
            if info:
                n_stages += len(info.stageIds)
        return dt, len(new), n_stages

    # warmup each once, then measure
    for n in names:
        if n not in qs:
            print(f"{n}: NOT IN REGISTRY")
            continue
        run(n)
    print(f"{'query':30s}{'sec':>8s}{'jobs':>6s}{'stages':>8s}")
    for n in names:
        if n not in qs:
            continue
        dt, nj, ns = run(n)
        print(f"{n:30s}{dt:8.3f}{nj:6d}{ns:8d}")


if __name__ == "__main__":
    main()
