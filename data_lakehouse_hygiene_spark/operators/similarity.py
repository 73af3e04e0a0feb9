"""Embedding similarity search: brute-force cosine top-k (baseline) and a
random-hyperplane LSH-bucketed variant (the scale path), plus cosine
near-duplicate pairs.

Determinism / oracle parity: float32 components are cast to double (exact),
each pairwise product is floor-quantized to 12 decimals and summed as an
integer DECIMAL — an order-independent exact sum, so Spark and DuckDB agree
bit-for-bit regardless of aggregation order. sqrt/division are IEEE
correctly-rounded, hence identical. Final cosines are quantized to 6
decimals before any threshold/rank comparison.

Scale design (1e9+ vectors):
- Brute force is O(n·q) — fine for a broadcast-able query set (q ≤ ~1e4),
  the fact side streams through one scan, top-k via per-partition partial
  rank (window) after a shuffle on query_id.
- LSH: 8 deterministic hyperplanes → 256 buckets; candidates meet via a
  bucket equi-join; recall/latency tuned by planes and multi-probe. An IVF
  variant would replace hyperplanes with k-means centroids (Spark MLlib)
  — same join shape.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregates import quantize

DOT_SCALE = int(1e12)
N_PLANES = 8
HEX = "0123456789abcdef"


def _qprod(x: Column, y: Column) -> Column:
    """floor-quantized product of two float components, as integer units of
    1e-12 — exact and order-independent under integer summation. BIGINT
    accumulation (JVM long adds, not BigDecimal): with unit-normalized
    embeddings (|x| ≤ 1) and dim ≤ 4096 the sum is bounded by 4e15 ≪ 2^63;
    hyperplane projections (components ≤ 7.5) stay under 3e16. The oracle
    sums the same integers as HUGEINT — identical values either way."""
    return F.floor(
        x.cast("double") * y.cast("double") * F.lit(float(DOT_SCALE)) + F.lit(0.5)
    ).cast("bigint")


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent dot product of two array<float> columns (double)."""
    acc = F.aggregate(
        F.zip_with(a, b, _qprod),
        F.lit(0).cast("bigint"),
        lambda s, v: s + v,
    )
    return acc.cast("double") / F.lit(float(DOT_SCALE))


def norms(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector L2 norm, computed once and joined — never recomputed per
    pair."""
    v = F.col(vec_col)
    return df.select(
        "vec_id", v.alias(vec_col), F.sqrt(dot_exact(v, v)).alias("norm")
    )


N_BLOCKS = 16


def cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_blocks: int = N_BLOCKS,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a<b) above a threshold:
    block-pair replication + an Arrow-vectorized numpy block kernel.

    Why not LSH blocking: at threshold 0.45 the pair angle is ~63°, so each
    random hyperplane splits a qualifying pair with p ≈ 0.35. Measured on
    the test corpus, planted pairs differ in up to 5 of 8 hyperplane bits —
    single-table multi-probe (Hamming-1) recalls 5/14 pairs, and banded-LSH
    recall 1-(1-(1-θ/π)^k)^L at this angle needs L ≫ 100 tables before it
    approaches 1 while k small enough to block is useless. No sub-quadratic
    EXACT algorithm exists for dense vectors at moderate thresholds, so the
    scale-honest design distributes the unavoidable quadratic compare:

    - every vector gets a deterministic block id (vec_id mod P);
    - the left side plays the ROW role — vector in block i is replicated to
      keys (i, c) for every column block c — and the right side the COLUMN
      role — block j replicated to (r, j) for every r — so each unordered
      pair meets EXACTLY once with ``vec_a < vec_b`` keeping one
      orientation;
    - the two sides meet in a cogrouped ``applyInPandas``: each (i, j)
      block pair lands on one task, the m×n×d quantized products run as a
      row-chunked numpy broadcast (C speed, not interpreted expression
      lambdas — measured 3.3× end-to-end at sf0.1), and ONLY qualifying
      pairs cross Arrow back to the JVM.

    Shuffle volume is O(n·P) vector rows — identical to the equi-join
    formulation (see ``cosine_pairs_catalyst``) — and the pair comparisons
    are spread over P² independent tasks of ~n/P vectors per side — the
    standard distributed blocked similarity join, with P sized to the
    cluster (P ≈ sqrt(cores) keys saturates the executors). The kernel
    reproduces the engine arithmetic bit-for-bit: per-component
    floor-quantized products summed in int64, IEEE double sqrt/divide, the
    same 6-decimal quantization (asserted equal to the Catalyst path in
    tests). For true near-duplicate thresholds (≥ ~0.8, where hyperplane
    agreement is high) prefer the genuinely sub-quadratic ``lsh_ann``
    banding.
    """
    import numpy as np
    import pandas as pd

    scale = float(DOT_SCALE)
    qdigits = float(1e6)

    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    other = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
    a = df.select(
        "vec_id", F.col(vec_col).alias("v"), blk.alias("k1"), other.alias("k2")
    )
    # The COLUMN side carries RENAMED attributes (vec_id_b / v_b): both
    # sides derive from the SAME source DataFrame, and self-cogroups with
    # identical attribute names have been observed (Spark 4.1, small
    # single-file inputs) to deliver the right-side batch WITHOUT its
    # duplicate-named columns — a silent KeyError in the kernel. Distinct
    # names make the two sides unambiguous regardless of plan shape.
    b = df.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col(vec_col).alias("v_b"),
        other.alias("k1"),
        blk.alias("k2"),
    )

    def _block_kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        A = np.vstack(left["v"].to_numpy()).astype(np.float64)
        B = np.vstack(right["v_b"].to_numpy()).astype(np.float64)
        ia = left["vec_id"].to_numpy()
        ib = right["vec_id_b"].to_numpy()
        # norms exactly as norms(): sqrt((Σ floor(v·v·S + .5)) / S)
        na = np.sqrt(
            np.floor(A * A * scale + 0.5).astype(np.int64).sum(axis=1) / scale
        )
        nb = np.sqrt(
            np.floor(B * B * scale + 0.5).astype(np.int64).sum(axis=1) / scale
        )
        out = [empty]
        # chunk rows so the m×n×d broadcast temp stays ~256·|B|·d doubles
        for lo in range(0, len(A), 256):
            Ac, iac, nac = A[lo : lo + 256], ia[lo : lo + 256], na[lo : lo + 256]
            dotq = (
                np.floor(Ac[:, None, :] * B[None, :, :] * scale + 0.5)
                .astype(np.int64)
                .sum(axis=2)
            )
            cos = (dotq / scale) / np.outer(nac, nb)
            cosq = np.floor(cos * qdigits + 0.5) / qdigits
            m = (iac[:, None] < ib[None, :]) & (cosq >= threshold)
            r, c = np.nonzero(m)
            if len(r):
                out.append(
                    pd.DataFrame(
                        {"vec_a": iac[r], "vec_b": ib[c], "cosine": cosq[r, c]}
                    )
                )
        return pd.concat(out, ignore_index=True)

    return (
        a.groupBy("k1", "k2")
        .cogroup(b.groupBy("k1", "k2"))
        .applyInPandas(_block_kernel, "vec_a long, vec_b long, cosine double")
    )


def cosine_pairs_catalyst(
    df: DataFrame,
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_blocks: int = N_BLOCKS,
) -> DataFrame:
    """Pure-Catalyst formulation of ``cosine_pairs`` (same block-pair
    replication, candidates meet via a shuffle-hash equi-join and the dot
    product runs as in-row expression lambdas). Kept as the no-Python
    fallback and as the equality witness for the Arrow kernel — outputs
    are asserted bit-identical in tests."""
    n = norms(df, vec_col)
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks))
    other = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
    a = n.select(
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("norm_a"),
        blk.alias("k1"),
        other.alias("k2"),
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("norm_b"),
        other.alias("k1"),
        blk.alias("k2"),
    )
    pairs = a.hint("shuffle_hash").join(b, on=["k1", "k2"]).where(
        F.col("vec_a") < F.col("vec_b")
    )
    cos = dot_exact(F.col("va"), F.col("vb")) / (
        F.col("norm_a") * F.col("norm_b")
    )
    return pairs.select(
        "vec_a", "vec_b", quantize(cos, 6).alias("cosine")
    ).where(F.col("cosine") >= threshold)


def cosine_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    non-identical vectors, deterministically tie-broken by vec_id."""
    from pyspark.sql.window import Window

    if query_pred is None:
        query_pred = F.col("vec_id") < 3
    n = norms(df, vec_col)
    q = n.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cos = dot_exact(F.col("qv"), F.col(vec_col)) / (
        F.col("qnorm") * F.col("norm")
    )
    scored = (
        n.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", quantize(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# The deterministic hyperplanes are DATA-INDEPENDENT constants (component
# (p, i) = hex-digit value of md5('p:i') minus 7.5, reproducible in any
# engine with md5 — the oracle SQL derives the identical values from
# DuckDB's md5). They are therefore precomputed here with hashlib —
# bit-identical to the Spark-expression form — and shipped as ONE array
# literal per plane: the expression form re-hashed md5 per VECTOR COMPONENT
# per plane at runtime inside interpreted HOF lambdas, and cost ~0.9 s of
# py4j construction per query call on top.
_MAX_DIM = 1024


@_lru_cache(maxsize=None)
def _plane_values(p: int) -> tuple[float, ...]:
    import hashlib

    return tuple(
        float(int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16)) - 7.5
        for i in range(_MAX_DIM)
    )


@_lru_cache(maxsize=None)
def _plane_literal(p: int) -> str:
    """SQL array literal for plane p. A string parsed by one F.expr:
    ``F.lit(<python list>)`` round-trips every element through py4j
    individually (~6 s for 8×1024 components), and per-element
    ``F.array(F.lit(x), ...)`` is the same thing spelled out."""
    return "array(" + ",".join(f"{x}D" for x in _plane_values(p)) + ")"


def lsh_bucket(vec_col: str = "embedding") -> Column:
    """Random-hyperplane LSH bucket id (0..2^N_PLANES-1) for a vector:
    bit p = sign of <v, plane_p>. Pure projection — no shuffle. Vectors
    wider than the precomputed plane tables fail loudly via assert_true
    (raise _MAX_DIM rather than silently truncating the projection)."""
    v = F.col(vec_col)
    guard = F.assert_true(F.size(v) <= F.lit(_MAX_DIM))
    bucket = F.lit(0)
    for p in range(N_PLANES):
        plane = F.slice(F.expr(_plane_literal(p)), F.lit(1), F.size(v))
        proj = F.aggregate(
            F.zip_with(v, plane, _qprod),
            F.lit(0).cast("bigint"),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return F.when(guard.isNull(), bucket)


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector — the storage/serving
    compression step before ANN indexing (4× smaller than float32, dot
    products stay int-SIMD-able).

    scale = max|x| / 127; q_i = floor(x_i·127/max|x| + 0.5) (round-half-up
    — bit-identical in both engines, unlike banker's round). Pure per-row
    projection, no shuffle; zero vectors quantize to all-zero with scale 0.
    """
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    q = F.when(absmax > 0, F.transform(
        v,
        lambda x: F.floor(
            x.cast("double") * F.lit(127.0) / absmax + F.lit(0.5)
        ).cast("bigint"),
    )).otherwise(F.transform(v, lambda x: F.lit(0).cast("bigint")))
    return df.select(
        "vec_id",
        (absmax / F.lit(127.0)).alias("scale"),
        q.alias("q"),
    )


def lsh_near_dup_pairs(
    df: DataFrame, vec_col: str = "embedding", threshold: float = 0.45
) -> DataFrame:
    """SUB-QUADRATIC approximate near-dup mining: candidate pairs are
    restricted to hyperplane buckets that are equal or differ in exactly
    one bit (Hamming-1 multiprobe), then scored with the exact cosine.

    This is the scale path ``cosine_pairs`` deliberately is not: candidates
    per vector are ~9n/256 instead of n, at the price of recall. The
    operator's CONTRACT is the bucket-restricted definition — the oracle
    mirrors the same bucket condition in SQL, so the declared query has
    exact parity over its approximate semantics; recall vs the exact
    operator is measured separately in tests (5/14 at cosine 0.45 on this
    corpus — low because 0.45 is a ~63° angle; at true near-dup thresholds
    ≥0.85 hyperplane agreement is ~0.93/plane and recall is high).

    Exactly-once pairing: the left side carries its own bucket, the right
    side explodes bucket ∪ {bucket⊕2^p}; a pair at bucket-Hamming 0 or 1
    matches exactly one probe, and ``vec_a < vec_b`` fixes orientation.
    """
    n = norms(df, vec_col).withColumn("bucket", lsh_bucket(vec_col))
    a = n.select(
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("norm_a"),
        "bucket",
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(2**p)) for p in range(N_PLANES)],
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("norm_b"),
        F.explode(probes).alias("bucket"),
    )
    pairs = a.hint("shuffle_hash").join(b, on="bucket").where(
        F.col("vec_a") < F.col("vec_b")
    )
    cos = dot_exact(F.col("va"), F.col("vb")) / (
        F.col("norm_a") * F.col("norm_b")
    )
    return pairs.select(
        "vec_a", "vec_b", quantize(cos, 6).alias("cosine")
    ).where(F.col("cosine") >= threshold)


def ivf_ann(
    df: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "label",
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN: candidates limited to the query's coarse cluster
    (here a precomputed assignment column; ``kmeans_fit_assign`` below is
    the deterministic in-repo trainer that produces one), then exact
    cosine + top-k.

    Same join shape as ``lsh_ann`` — an equi-join on the cluster id — so at
    1e9 vectors each query touches ~n/n_clusters candidates. Unlike LSH the
    partitioning is data-adaptive (centroids follow density).

    The norm+label projection is computed inline (``norms()`` drops the
    cluster column, and joining it back on vec_id self-joined the
    embeddings table — two extra corpus scans for a column that was in
    the scan all along)."""
    from pyspark.sql.window import Window

    if query_pred is None:
        query_pred = F.col("vec_id") < 3
    v = F.col(vec_col)
    n = df.select(
        "vec_id",
        v.alias(vec_col),
        F.sqrt(dot_exact(v, v)).alias("norm"),
        cluster_col,
    )
    q = n.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qnorm"),
        cluster_col,
    )
    cos = dot_exact(F.col("qv"), F.col(vec_col)) / (
        F.col("qnorm") * F.col("norm")
    )
    scored = (
        n.join(F.broadcast(q), on=cluster_col)
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", quantize(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_ann(
    df: DataFrame,
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
    multiprobe: bool = True,
) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors: queries only meet
    candidates in their own hyperplane bucket, then exact cosine + top-k.

    ``multiprobe=True`` additionally probes every bucket at Hamming
    distance 1 (one flipped hyperplane bit): candidates grow from ~n/256
    to ~9n/256 per query while recall rises sharply — the standard
    multi-probe LSH trade. The probe set explodes on the (tiny, broadcast)
    QUERY side, so the candidate join stays one equi-join.
    """
    from pyspark.sql.window import Window

    if query_pred is None:
        query_pred = F.col("vec_id") < 3
    n = norms(df, vec_col).withColumn("bucket", lsh_bucket(vec_col))
    q = n.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(2**p))
                for p in range(N_PLANES)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    cos = dot_exact(F.col("qv"), F.col(vec_col)) / (
        F.col("qnorm") * F.col("norm")
    )
    scored = (
        n.join(F.broadcast(q), on="bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", quantize(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "label",
    threshold: float = 0.45,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — no reference-repo counterpart; capability
    extension per SURVEY.md §2.11): drop an embedding when its cosine to
    an EARLIER (lower ``vec_id``) member of the SAME coarse cluster
    reaches ``threshold``. Output: one row per dropped vector with its
    keeper (``dup_of`` = the smallest qualifying earlier vec_id, the
    deterministic keeper election) and that pair's cosine.

    Scale shape — the whole point of the algorithm: the quadratic
    compare is confined WITHIN clusters, so the pair term is
    sum(n_c²)/2, controlled by the clustering granularity k (cluster
    size ~n/k; SemDeDup runs k-means with k large enough that clusters
    fit a task — same contract here, where ``cluster_col`` is the
    precomputed coarse assignment, cf. ``ivf_ann``). One hash exchange
    on the cluster key; the self-join meets on that key (shuffled-hash
    at scale, broadcast at toy scale — never SortMerge, plan-asserted
    engine-wide), dot products stay in codegen via ``dot_exact``.

    The documented trade (and why this is NOT ``embedding_near_dup``):
    cross-cluster near-duplicates are invisible — on the sf0.01 fixture
    only 2 of the 14 exact cosine≥0.45 pairs share a cluster, so
    semantic dedup drops exactly those 2 (test-pinned). Exactness
    within the blocking is oracle-checked; the blocking loss is the
    algorithm's published recall trade, not an implementation gap."""
    v = F.col(vec_col)
    n = df.select(
        "vec_id",
        v.alias(vec_col),
        F.sqrt(dot_exact(v, v)).alias("norm"),
        cluster_col,
    )
    earlier = n.select(
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
        cluster_col,
    )
    cos = dot_exact(F.col("va"), F.col(vec_col)) / (
        F.col("na") * F.col("norm")
    )
    cand = (
        n.join(earlier, on=cluster_col)
        .where(F.col("vec_a") < F.col("vec_id"))
        .select(
            F.col(cluster_col),
            "vec_id",
            "vec_a",
            quantize(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    return cand.groupBy("vec_id").agg(
        F.any_value(cluster_col).alias(cluster_col),
        F.min("vec_a").alias("dup_of"),
        F.expr("min_by(cosine, vec_a)").alias("cosine"),
    )


# Component quantization for the deterministic k-means: integer units of
# 1e-6. Distances are exact BIGINTs (dim 64 × (6e5)² ≈ 2.3e13 ≪ 2^63), so
# assignment and centroid updates are bit-identical in any engine — no
# float-sum order dependence anywhere in the loop.
KMEANS_SCALE = 1_000_000


def _kq(v: Column) -> Column:
    return F.transform(
        v,
        lambda x: F.floor(
            x.cast("double") * F.lit(float(KMEANS_SCALE)) + F.lit(0.5)
        ).cast("bigint"),
    )


def _kmeans_assign(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    """One assignment pass: exact integer squared distance to each centroid
    (centroids ship as literal arrays — the model broadcasts INSIDE the
    plan, no join), argmin with ties to the lowest cluster index."""
    dists = []
    for ci, c in enumerate(cents):
        lit = F.array(*[F.lit(int(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col("qv"), lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda s, v: s + v,
        )
        dists.append(d.alias(f"__d{ci}"))
    withd = q.select("vec_id", "qv", *dists)
    # F.least() requires >=2 args; with a single centroid the argmin IS
    # that centroid's distance.
    if len(cents) == 1:
        best = F.col("__d0")
    else:
        best = F.least(*[F.col(f"__d{ci}") for ci in range(len(cents))])
    cluster = F.lit(None).cast("int")
    for ci in reversed(range(len(cents))):
        cluster = F.when(F.col(f"__d{ci}") == best, F.lit(ci)).otherwise(
            cluster
        )
    return withd.select(
        "vec_id", "qv", cluster.alias("cluster"), best.alias("dist")
    )


def kmeans_fit_assign(
    df: DataFrame, vec_col: str = "embedding", k: int = 4, n_iter: int = 2
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column — the trainer
    that produces the coarse quantizer ``ivf_ann`` / ``semantic_dedup``
    consume as a precomputed assignment. Engine-portable BY CONSTRUCTION:
    components quantize to integer units (``KMEANS_SCALE``), squared
    distances and per-dimension sums are exact BIGINT arithmetic, and the
    centroid update is floor(sum/count) on doubles that are
    exactly-representable (|sum| < 2^53 up to ~1e9 unit-normalized
    vectors) — so there is NO float-summation order dependence and a SQL
    oracle replays every iteration bit-for-bit. Init = the k
    lowest-vec_id vectors; ties in assignment go to the lowest cluster
    index; an emptied cluster keeps its previous centroid.

    Scale shape per iteration: ONE scan-shaped assignment pass (centroids
    are literal arrays in the plan — ship-the-model, no join) + one
    map-side-combined (cluster, dim) aggregate whose output is k·dim rows
    — the only driver traffic (k=4·dim=64 = 256 longs/round, the
    dedup_clusters-style bounded collect). Returns the FINAL assignment
    (vec_id, cluster, dist) after ``n_iter`` updates.
    """
    import math

    from .cleaning import spread

    q = spread(df, key="vec_id").select(
        "vec_id", _kq(F.col(vec_col)).alias("qv")
    )
    init = q.orderBy("vec_id").limit(k).collect()
    cents = [list(r["qv"]) for r in init]
    # Fewer rows than k: the init collect returns all rows there are, so
    # the effective k is len(cents) — without the clamp the centroid
    # update below indexes cents[ci] past the end.
    k = min(k, len(cents))
    if not cents:  # empty input: typed empty result, not a zero-arg least()
        return (
            q.select(
                "vec_id",
                F.lit(None).cast("int").alias("cluster"),
                F.lit(None).cast("bigint").alias("dist"),
            )
            .where(F.lit(False))
        )
    for _ in range(n_iter):
        a = _kmeans_assign(q, cents)
        stats = (
            a.select("cluster", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        bycl: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            bycl.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["c"])
        cents = [
            [
                math.floor(bycl[ci][p][0] / bycl[ci][p][1])
                for p in range(len(cents[ci]))
            ]
            if ci in bycl
            else cents[ci]
            for ci in range(k)
        ]
    return _kmeans_assign(q, cents).select("vec_id", "cluster", "dist")
