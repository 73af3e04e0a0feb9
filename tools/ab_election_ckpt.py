"""Interleaved in-process A/B for the round-15 election checkpoint
(`dedup._ckpt_small`): OLD = two-evaluation rollup+probe (gate disabled),
NEW = position/line projection materialized once (eager localCheckpoint,
gate at its shipped default). Runs the REAL bench query functions on the
real sf directory so inputs match the bench exactly; judged by medians;
value-hash equality asserted per query before any timing is trusted.

Usage: python tools/ab_election_ckpt.py [reps] [q1 q2 ...]
"""

from __future__ import annotations

import hashlib
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_hygiene_spark.operators import dedup  # noqa: E402
from data_lakehouse_hygiene_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "substring_dedup",
    "substring_dedup_apply",
    "substring_dedup_keep_first",
    "line_dedup",
]


def value_hash(df) -> str:
    rows = sorted(repr(r) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    names = sys.argv[2:] or QUERIES
    spark = get_spark(app_name="ab_election_ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    default_lim = dedup.ELECTION_CKPT_MAX_BYTES
    arms = {"old": 0, "new": default_lim}

    # value equality first
    for name in names:
        hashes = {}
        for arm, lim in arms.items():
            dedup.ELECTION_CKPT_MAX_BYTES = lim
            hashes[arm] = value_hash(qs[name](spark, SF_DIR))
        assert hashes["old"] == hashes["new"], (name, hashes)
        print(f"{name}: value hash equal {hashes['old'][:12]}")

    times: dict[tuple[str, str], list[float]] = {}
    # warmup both arms once
    for name in names:
        for arm, lim in arms.items():
            dedup.ELECTION_CKPT_MAX_BYTES = lim
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
    for rep in range(reps):
        for name in names:
            for arm, lim in arms.items():
                dedup.ELECTION_CKPT_MAX_BYTES = lim
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                times.setdefault((name, arm), []).append(dt)
    dedup.ELECTION_CKPT_MAX_BYTES = default_lim
    for name in names:
        o = times[(name, "old")]
        n = times[(name, "new")]
        mo, mn = statistics.median(o), statistics.median(n)
        print(
            f"{name:30s} old {mo:6.3f} new {mn:6.3f} "
            f"speedup {mo / mn:5.2f}x  "
            f"old={['%.2f' % x for x in o]} new={['%.2f' % x for x in n]}"
        )


if __name__ == "__main__":
    main()
