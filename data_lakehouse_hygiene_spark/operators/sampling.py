"""Deterministic sampling + sketching for training-data pipelines.

``df.sample()`` is seed-dependent per partition layout — resampling after a
repartition changes membership, which poisons reproducibility of a training
mix. These operators derive membership from a HASH of a stable key instead:
the same row is in or out regardless of partitioning, executor count, or
retries, and the DuckDB oracle reproduces the exact row set.

Scale notes:
- hash-threshold sampling is a pure per-row filter — pushes to the scan's
  post-filter, no shuffle, trivially parallel;
- fixed-size sampling is a global top-k by hash — one shuffle of the
  candidate hashes (sort-limit), independent of data order;
- the KMV (k-minimum-values) sketch estimates distinct counts from the
  k smallest hashes — one aggregate pass, mergeable across partitions,
  and (unlike HLL implementations) bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import base_hash

# 60-bit hash space (15 hex chars of md5, see dedup.base_hash).
HASH_SPACE = float(2**60)


def hash_sample(df: DataFrame, key: str, rate_pct: int) -> DataFrame:
    """Keep rows whose key-hash falls in the lowest ``rate_pct`` percent of
    hash space — a deterministic, partition-independent Bernoulli sample."""
    return df.where(base_hash(F.col(key).cast("string")) % 100 < rate_pct)


def stratified_hash_sample(
    df: DataFrame, key: str, stratum: str, rates_pct: dict[str, int], default_pct: int = 0
) -> DataFrame:
    """Per-stratum deterministic sampling — the 'mixture weights' operator
    of a training-data pipeline (e.g. 50% of src A, 10% of src B)."""
    rate = F.lit(default_pct)
    for s, p in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum) == s, F.lit(p)).otherwise(rate)
    return df.where(base_hash(F.col(key).cast("string")) % 100 < rate)


def fixed_size_sample(df: DataFrame, key: str, n: int) -> DataFrame:
    """Exactly-n deterministic sample: the n rows with the smallest key
    hashes (global sort-limit on the hash, ties impossible for distinct
    keys; stable under any partitioning)."""
    h = base_hash(F.col(key).cast("string")).alias("__h")
    return (
        df.select("*", h)
        .orderBy("__h")
        .limit(n)
        .drop("__h")
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """K-minimum-values distinct-count sketch: with U = k-th smallest of
    the distinct key hashes normalized to (0,1], estimate D ≈ (k-1)/U.

    One aggregate pass; mergeable (union of sketches = sketch of union).
    All arithmetic is integer + one division, so Spark and DuckDB agree
    bit-for-bit — which HLL sketches never do across implementations.
    Returns (n_exact_if_small, kth_hash, estimate) — when fewer than k
    distinct values exist the sketch IS the exact count.
    """
    h = base_hash(F.col(col).cast("string")).alias("__h")
    mins = (
        df.select(h)
        .distinct()
        .orderBy("__h")
        .limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).alias("n_mins"),
        F.max("__h").alias("kth_hash"),
    ).select(
        "n_mins",
        "kth_hash",
        F.when(
            F.col("n_mins") < k, F.col("n_mins").cast("double")
        )
        .otherwise(
            (F.lit(float(k - 1)))
            / (F.col("kth_hash").cast("double") / F.lit(HASH_SPACE))
        )
        .alias("distinct_estimate"),
    )
