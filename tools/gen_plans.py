"""Regenerate the PLANS.md physical-plan audit table.

Usage: python tools/gen_plans.py [> PLANS.md.fragment]

For every declared (batch) query, prints one markdown row with:
  shuffles      Exchange operators (minus ReusedExchange)
  bcast         BroadcastExchange operators
  smj           SortMergeJoin operators (design target: 0)
  pushed_scans  parquet scans whose PushedFilters list is non-empty
  codegen       distinct WholeStageCodegen regions
AQE is disabled for the printout only (the adaptive wrapper hides codegen
markers until stages finalize); sessions keep AQE on in production.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from data_lakehouse_hygiene_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKIP = {"streaming_time_bucket", "streaming_sliding_window",
        "streaming_session_window", "streaming_dedup", "streaming_near_dup",
        "streaming_debounce",
        # driver-looped iterative fixpoint — the printed plan would only
        # show the final round's join, not the algorithm
        "dedup_clusters", "dedup_clusters_star", "dedup_keep_best",
        "kmeans_assign", "kcenter_sample", "pq_encode", "pq_ann",
        "ivfpq_ann",
        "streaming_join", "streaming_enrich"}  # streaming plans finalize per micro-batch


def audit(plan: str) -> dict[str, int]:
    return {
        "shuffles": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"\bReusedExchange\b", plan)),
        "bcast": len(re.findall(r"\bBroadcastExchange\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "pushed_scans": len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        ),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def parse_notes(path: str) -> dict[str, str]:
    """Per-row notes from an existing PLANS.md-style table: the LAST
    pipe-delimited cell of each ``| name | ... |`` data row. Used to
    merge hand-curated notes across regenerations (the round-14 regen
    wiped ~20 of them — round-15 advisory fix)."""
    notes: dict[str, str] = {}
    for line in open(path):
        line = line.strip()
        if not line.startswith("|") or line.startswith("|---"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) >= 7 and cells[0] != "query" and cells[6]:
            notes[cells[0]] = cells[6]
    return notes


def main() -> None:
    # --merge-notes f1 [f2 ...]: carry per-row notes forward from prior
    # table versions (later files win on conflict).
    merged_notes: dict[str, str] = {}
    args = sys.argv[1:]
    if args and args[0] == "--merge-notes":
        for path in args[1:]:
            merged_notes.update(parse_notes(path))
    spark = get_spark(app_name="gen_plans")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(entrymod.queries().items()):
        if name in SKIP:
            continue
        df = fn(spark, SF_DIR)
        # pin_session (called inside every query) re-enables AQE, so turn
        # it off AFTER the DataFrame is built, right before the printout.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            plan = df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        rows.append((name, audit(plan)))
    print("| query | shuffles | bcast | smj | pushed_scans | codegen | notes |")
    print("|---|---|---|---|---|---|---|")
    for name, a in rows:
        note = merged_notes.get(name) or (
            "arrow-python"
            if name
            in (
                "binary_features",
                "media_decode",
                "embedding_near_dup",
                "repetition_metrics",
                "media_transform",
                "curation_funnel",
            )
            else ""
        )
        print(
            f"| {name} | {a['shuffles']} | {a['bcast']} | {a['smj']} |"
            f" {a['pushed_scans']} | {a['codegen']} | {note} |"
        )


if __name__ == "__main__":
    main()
