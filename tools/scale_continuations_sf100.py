"""sf100 (2M × 64-dim) measurements for the sub-quadratic scale
continuations the exact path's refusal gates point to (SCALING.md
round-12): each operator in its SCALE configuration — the static knobs
the declared registry queries pin exist for oracle replay, not for 2M
vectors (static 8 hyperplanes at 2M rows = 7·10¹⁰ candidates; the
replicated 10-label column = 2·10¹¹ within-cluster pairs — both
refused/infeasible by design).

- semantic_dedup over a task-sized clustering (hash split, k=4096 →
  ~500 rows/cluster, Σ pairs ≈ 5·10⁸) — the SemDeDup contract's
  granularity, cf. the operator's granularity guard message.
- lsh_near_dup_pairs with n_planes="auto" (occupancy-bounded: 15 planes
  at 2M rows → ~1·10⁹ bucket-restricted candidates).

Prints one JSON line per op.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf100")


def main() -> None:
    from pyspark.sql import functions as F

    from data_lakehouse_hygiene_spark.operators import similarity
    from data_lakehouse_hygiene_spark.session import get_spark

    spark = get_spark(
        app_name="sf100-continuations",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sql("select count(*) from range(1000000)").collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    if which in ("both", "semantic"):
        clustered = emb.withColumn(
            "task_cluster",
            F.pmod(F.xxhash64("vec_id"), F.lit(4096)).cast("int"),
        )
        t0 = time.time()
        n = similarity.semantic_dedup(
            clustered, cluster_col="task_cluster"
        ).count()
        print(
            json.dumps(
                {
                    "op": "semantic_dedup",
                    "config": "hash k=4096",
                    "rows_dropped": int(n),
                    "sec": round(time.time() - t0, 2),
                }
            )
        )

    if which in ("both", "lsh"):
        t0 = time.time()
        n = similarity.lsh_near_dup_pairs(emb, n_planes="auto").count()
        print(
            json.dumps(
                {
                    "op": "lsh_near_dup",
                    "config": "n_planes=auto",
                    "pairs": int(n),
                    "sec": round(time.time() - t0, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
