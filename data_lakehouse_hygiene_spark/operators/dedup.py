"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has no dedup (its tables are single-user scale); these are the
first-class LLM-pipeline extensions. All hashing is md5-hex (bit-identical
in Spark and DuckDB) so every operator is oracle-checkable.

Scale design (100 TB corpus):
- Exact dedup: hash-groupBy on a digest — one shuffle of (digest, doc_id),
  map-side partial aggregation, no text movement.
- MinHash: signatures are per-document aggregates over *array-local*
  distinct shingles (``array_distinct`` before explode — no pre-shuffle
  dedup); one shuffle by doc_id, then the LSH band explode is narrow.
  Candidate pairs are generated in-row per (band, band_key) bucket —
  never an O(n²) cross join; hot buckets (mass-duplicate clusters) are
  capped at ``BUCKET_CAP`` and routed to exact dedup instead.
- n-gram Jaccard: Jaccard over shingles with document frequency ≤
  ``DF_CAP`` (boilerplate shingles carry no signal and blow up k²/2);
  O(capped shingle multiplicity), not O(n²).
- SimHash: per-row 64-bit signature (pure projection), near-dup via 8×8-bit
  prefix-band blocking with pigeonhole-guaranteed recall at Hamming ≤ 7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .aggregates import quantize
from .cleaning import spread
from .text import tokens

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# Linear-congruential minhash family over one md5-derived base hash:
# h_j = (A_j * (h mod 2^31) + B_j) mod P. One md5 per shingle instead of
# N_HASHES — the md5 was the dominant signature cost. Constants are fixed
# (shared verbatim with the oracle SQL); P is the Mersenne prime 2^31-1.
MINHASH_P = 2_147_483_647
MINHASH_AB: tuple[tuple[int, int], ...] = tuple(
    ((j * 2 + 1) * 40_503 + 12_289, j * 9_176 + 777) for j in range(N_HASHES)
)


def base_hash(s: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5, identical to
    DuckDB's ``('0x' || substr(md5(s),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def content_key128(col: Column) -> tuple[Column, Column]:
    """128-bit content-equality key as TWO independent xxhash64 lanes —
    for INTERNAL digests only (keys that never appear in output and are
    never replayed by an oracle; equality is their whole contract).

    Round 14 (optimization guide §2.3, narrower types / §1.2, per-task
    work): md5-hex cost ~0.19 s per position-stream pass at sf0.1 vs
    ~0 for xxhash64 (crypto vs non-crypto), and its 32-char hex string
    is ~3x the wire width of two longs on every exchange and join key
    compare. Two lanes keep md5-class collision safety FOR
    NON-ADVERSARIAL DATA: the probability two distinct contents share
    BOTH lanes is ~2^-128-ish, so at 10^12 keys (100 TB position
    streams) expected collisions stay ~1e-15 — one 64-bit lane alone
    would expect ~10^4 there, which for exact operators is a wrong
    answer, not a slowdown.

    NON-ADVERSARIAL-INPUT ASSUMPTION (round-15, per the round-14
    advisory): xxhash64 is not cryptographic and lane 2 is the same
    function under a derived seed, so the ~2^-128 math holds for
    random/benign content only — an adversary who studies the function
    could in principle CRAFT corpus content that collides in both lanes
    simultaneously, silently merging distinct lines/spans in the exact
    operators keyed here (line_dedup, the substring family,
    incremental_line_dedup, ngram_jaccard's shingle keys). Pipelines
    that dedup hostile/untrusted submissions where an attacker benefits
    from forcing a merge should swap this for a keyed or cryptographic
    digest (md5/sha/SipHash with a secret key) at the call sites — the
    keys are internal, so the swap changes no output contract.

    The seed-PREFIX trick makes the lanes independent:
    ``xxhash64(lit(1), s)`` folds the literal into the running seed
    BEFORE the content bytes, i.e. lane 2 = XxHash64(s, seed') with a
    different effective seed. (``xxhash64(s, lit(1))`` would post-mix
    lane 1's value and inherit every lane-1 collision.)
    """
    return F.xxhash64(col), F.xxhash64(F.lit(1), col)




def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content digest: one row per distinct normalized text,
    keeping the smallest doc_id as canonical representative."""
    digest = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(digest.alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def incremental_dedup(
    new_df: DataFrame, history_df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Rows of ``new_df`` whose (normalized) content digest does NOT appear
    in ``history_df`` — the incremental form of exact dedup: dedup each
    incoming batch against the already-ingested corpus without re-reading
    the corpus text.

    Scale shape: the history side collapses to DISTINCT 16-byte digests
    (one hash agg over history — in a real deployment this digest set is a
    maintained table, written once per batch, so the daily cost is the NEW
    batch only), then a LEFT ANTI equi-join on the digest. Spark plans the
    anti join hash-partitioned on the digest — perfectly uniform keys (md5),
    no skew by construction. When the history digest set is small enough it
    broadcasts; at 100 TB-corpus scale, keep it partitioned and let the
    anti join shuffle the (digest, doc_id) pairs of the new batch only —
    or pre-filter with a Bloom filter built over the digest table and
    anti-join the survivors (same semantics; the Bloom pass only removes
    guaranteed-novel rows early).
    """
    digest = F.md5(F.lower(F.trim(F.col(text_col))))
    hist = history_df.select(digest.alias("__digest")).distinct()
    return new_df.withColumn("__digest", digest).join(
        hist, "__digest", "left_anti"
    ).drop("__digest")


def shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a single-space-joined text column.

    Documents shorter than ``n`` tokens contribute the whole text as one
    shingle (so they still participate in dedup).

    NOTE: evaluating this directly over a raw text column re-evaluates the
    token split for every element reference inside the transform lambda
    (~n per shingle) — use :func:`shingle_rows`, which materializes the
    token array behind a projection boundary, for any full-corpus path.
    """
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
        lambda i: F.concat_ws(" ", *[toks[i + F.lit(j)] for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array(text_col)
    )


def shingle_rows(
    df: DataFrame, text_col: str = "text", n: int = 3, alias: str = "s"
) -> DataFrame:
    """Exploded (doc_id, shingle) rows with the token array split ONCE.

    The split is pinned in its own projection so Catalyst cannot inline it
    into the shingle lambda: CollapseProject keeps the boundary because a
    non-cheap expression (split) is referenced more than once above it.
    Without the boundary, every one of the ~n element accesses per shingle
    re-runs the split over the whole text — an O(n_tokens·n) scan-side
    blowup measured at ~7× wall on the bench corpus. Same output as
    ``explode(shingles(col))`` row for row.
    """
    elems = ", ".join(f"__toks[i + {j}]" for j in range(n))
    # Backtick-quote the column identifier (doubling any embedded backtick)
    # so names with spaces/dots/SQL metachars parse as identifiers, not SQL.
    ident = "`" + text_col.replace("`", "``") + "`"
    sh = F.expr(
        f"if(size(__toks) >= {n}, "
        f"array_distinct(transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', {elems}))), array({ident}))"
    )
    return df.select(
        "doc_id", F.col(text_col), tokens(F.col(text_col)).alias("__toks")
    ).select("doc_id", F.explode(sh).alias(alias))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """MinHash signature per document: component j = min over shingles of
    the j-th linear-congruential rehash of one md5-derived base hash.

    One md5 + N cheap integer transforms per shingle (instead of N md5s);
    the min-aggregate is a single map-side-combining hash aggregate.

    The N rehash aggregates are generated SQL strings (one expr parse
    each) — composing them from Column calls cost ~0.5 s of driver-side
    py4j round-trips per query call (see _swar_bits_sql for the measured
    pattern)."""
    # cost=2: 16 LCG rehash aggregates per shingle row (see spread()'s
    # round-14 width sweep — minhash median 0.44 → 0.36 s at the 2×
    # width at sf0.1, value-identical output).
    df = spread(df, cost=2)
    ex = shingle_rows(df, text_col).select(
        "doc_id", (base_hash(F.col("s")) % F.lit(2**31)).alias("h")
    )
    aggs = [
        F.expr(f"min(({a} * h + {b}) % {MINHASH_P}) AS h{j}")
        for j, (a, b) in enumerate(MINHASH_AB[:n_hashes])
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def lsh_bands(sig: DataFrame) -> DataFrame:
    """Explode a signature frame into (doc_id, band, band_key, sig array).

    Band array and signature array are generated SQL strings — the
    Column-call form cost ~80 py4j round-trips per query call (see
    _swar_bits_sql for the measured pattern)."""
    sig_arr = F.expr(
        "array(" + ",".join(f"h{j}" for j in range(N_HASHES)) + ") AS sig"
    )
    bands = F.expr(
        "array("
        + ",".join(
            f"struct({b} AS band, md5(concat_ws('|', "
            + ", ".join(
                f"cast(h{b * ROWS_PER_BAND + r} as string)"
                for r in range(ROWS_PER_BAND)
            )
            + ")) AS band_key)"
            for b in range(N_BANDS)
        )
        + ")"
    )
    return sig.select(
        "doc_id", sig_arr, F.explode(bands).alias("bk")
    ).select("doc_id", "sig", "bk.band", "bk.band_key")


BUCKET_CAP = 32


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: docs sharing ≥1 LSH band bucket,
    scored by estimated Jaccard (fraction of equal signature components).

    Only docs agreeing on a full band ever meet — never an all-pairs join.
    Candidates are generated IN-ROW per band bucket: one groupBy on
    (band, band_key) collects the bucket's (doc_id, sig) structs (sorted,
    so pair order is deterministic) and array lambdas emit the a<b pairs —
    the signature subtree is evaluated ONCE (a self-join would evaluate it
    twice) and bucket memory is bounded by ``bucket_cap``.

    Hot-bucket cap: a band bucket with more than ``bucket_cap`` docs means
    that many documents share an identical 4-component signature band —
    at corpus scale that is a mass-duplication cluster whose k² pair
    output carries no ranking signal (est_jaccard ≈ 1 for all of them);
    such clusters belong to ``exact_dedup_groups``, so buckets above the
    cap are dropped. The oracle SQL applies the identical cap, and the
    planted near-dup pairs sit in buckets of ≤3 docs (test-asserted).

    est_jaccard is identical for every band a pair collides in, so the
    de-dup of candidate pairs is a plain groupBy max.
    """
    b = lsh_bands(minhash_signatures(df, text_col))
    grp = (
        b.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "sig"))).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= bucket_cap))
    )
    combos = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> "
        "struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "size(filter(zip_with(x.sig, y.sig, (u, v) -> u = v), t -> t)) "
        "AS eq))))"
    )
    est = F.col("p.eq").cast("double") / F.lit(float(N_HASHES))
    return (
        grp.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b", est.alias("est_jaccard"))
        .groupBy("doc_a", "doc_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


DF_CAP = 100


# Estimated-input-bytes crossover between the two ngram_jaccard plan
# shapes (see ngram_jaccard_pairs docstring). Below: the 3-branch
# broadcast form (branches overlap on idle cores, scans are page-cached —
# measured 1.59 vs 1.94 s interleaved min-of-5 at sf0.1). Above: the
# single-scan form (scan I/O is real and 3x scan + 3x shingle exchange
# costs more than 1x scan + 2 exchanges).
NGRAM_SINGLE_SCAN_BYTES = 8 * 1024**3
# Above this input estimate, the broadcast-path candidate explode gets an
# explicit-width redistribution (one tiny extra exchange); below it, the
# whole candidate set fits a task or two and the exchange is pure latency.
NGRAM_SPREAD_EXPLODE_BYTES = 64 * 1024**2


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    df_cap: int = DF_CAP,
    single_scan: bool | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity over INFORMATIVE shingles, join-free
    on the fact side.

    Hot-shingle cap: a shingle appearing in more than ``df_cap`` documents
    (boilerplate — "all rights reserved …") yields k(k-1)/2 candidate pairs
    while carrying no similarity signal; at corpus scale one such shingle
    is a job-killer. The similarity definition is therefore Jaccard over
    the shingle sets RESTRICTED to shingles with document frequency ≤
    ``df_cap`` — applied consistently to intersections AND set sizes, and
    mirrored verbatim in the oracle SQL. On the test corpus max df is 7,
    so the planted pairs are unaffected (test-asserted).

    Common plan spine: explode shingles, compute per-shingle df as a
    PARTIAL-AGG rollup (``groupBy(s).count()`` — map-side combine
    collapses a mass-duplicated shingle to one row per map task before
    the exchange) filtered to df ≤ cap, and join it back onto the
    shingle stream (shuffle-hash, so AQE skew-split divides a hot
    probe partition across tasks). Round 14 de-skew: the previous COUNT
    window partitioned by the raw shingle stream serialized ALL
    occurrences of a boilerplate shingle into ONE WindowExec task —
    windows are never AQE-skew-splittable — which sorted and spilled
    the hot key before the cap could drop it; the rollup+join shape
    keeps every task bounded at the cost of a second (column-pruned)
    scan for the df branch. Then the a<b pairs generate inside the row
    with array lambdas: the per-shingle doc list is bounded by
    ``df_cap``, so no unbounded collect_list; pair rows per shingle are
    bounded by df_cap²/2.

    TWO plan shapes for the Jaccard denominator, value-identical
    (test-asserted), selected by ``single_scan`` (None = by the optimizer's
    estimated input size vs ``NGRAM_SINGLE_SCAN_BYTES``):

    - ``single_scan=False`` (small inputs): per-doc sizes become a tiny
      size table broadcast-joined onto the pairs. The size table's three
      transitive consumers have diverging column prunings that defeat
      ReuseExchange, so Catalyst re-scans the corpus and re-runs the
      shingle window once per consumer (3 scans, 9 exchanges) — but the
      branches run CONCURRENTLY on idle cores over page-cached parquet,
      so wall time ≈ max(branch), not sum. Measured 1.59 s vs the
      single-scan form's 1.94 s at sf0.1 (interleaved min-of-5; round 5
      shipped single-scan unconditionally and regressed 1.67×).
    - ``single_scan=True`` (large inputs): per-doc capped set sizes ride
      a SECOND count window (partitioned by doc_id) on the same stream
      and travel inside the collect_list structs through pair
      generation — 1 scan, 5 exchanges, no joins. At 100 TB the cluster
      has no idle cores to hide triple scans behind, and
      3·(scan + shingle-exchange) > 1·scan + 2 exchanges, so the linear
      chain wins; a localCheckpoint hybrid measured slower still (it
      materializes the full shingle stream)."""
    est = _estimated_bytes(df)
    if single_scan is None:
        single_scan = est > NGRAM_SINGLE_SCAN_BYTES
    df = spread(df)
    # Key the exploded shingle stream by the 128-bit xxhash pair instead
    # of the raw shingle string (round 14): "s" is equality-only from
    # here on (it never reaches output), and the pair gives fixed-width
    # 16-byte exchange/join keys in place of variable-length strings —
    # see content_key128 for the collision math.
    s1, s2 = content_key128(F.col("s"))
    sh = shingle_rows(df, text_col).select(
        "doc_id", s1.alias("s1"), s2.alias("s2")
    )
    dfc = (
        sh.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
    )
    sh_ok = sh.join(dfc.hint("shuffle_hash"), ["s1", "s2"])
    if not single_scan:
        return _ngram_pairs_broadcast_sizes(
            sh_ok, threshold, spread_explode=est > NGRAM_SPREAD_EXPLODE_BYTES
        )
    sh_n = sh_ok.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    pair_lists = (
        sh_n.where(F.col("df") >= 2)
        .groupBy("s1", "s2")
        .agg(
            F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ds")
        )
        .where(F.size("ds") >= 2)
    )
    # Explicit-width exchange before the pair explode. The capped lists are
    # tiny (≤ df_cap structs each), so AQE coalesces the groupBy output to a
    # handful of partitions — and the ~df_cap²/2-per-list explode below then
    # runs on that handful of cores (measured at sf30: 13.3M candidate rows
    # on 5 partitions, max 4.1M on one). Redistributing the LISTS costs one
    # tiny narrow-row shuffle; an explicit numPartitions is exempt from AQE
    # coalescing, so the explode's fan-out lands evenly across the cluster.
    pair_lists = pair_lists.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "s1", "s2"
    )
    combos = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> "
        "struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "x.n AS na, y.n AS nb))))"
    )
    inter = (
        pair_lists.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.na", "p.nb")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("i"),
            F.any_value("na").alias("na"),
            F.any_value("nb").alias("nb"),
        )
    )
    j = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return inter.select(
        "doc_a", "doc_b", quantize(j, 6).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's estimated size of ``df``'s input (file-size based for
    parquet scans) — a planning-time statistic, no job runs. Falls back to
    0 (→ the small-input plan) if the stats walk fails, AND when Catalyst
    reports its unknown-stats sentinel: LogicalRDD / createDataFrame-backed
    plans have no file statistics and surface
    ``spark.sql.defaultSizeInBytes`` (Long.MaxValue by default), which is
    "size unknown", not "huge" — treating it as huge would route tiny
    in-memory inputs onto the corpus-scale plans (and, pre-round-9, did)."""
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 0
    # Long.MaxValue sentinel (or any absurd >=2^62 estimate product of it
    # propagating through multipliers): stats are unknown — plan small.
    if size >= (1 << 62):
        return 0
    return size


def _ngram_pairs_broadcast_sizes(
    sh_ok: DataFrame, threshold: float, spread_explode: bool = False
) -> DataFrame:
    """Small-input ngram_jaccard tail: per-doc sizes as a broadcast size
    table (see ngram_jaccard_pairs docstring for the crossover analysis).
    ``sh_ok`` is the capped (doc_id, s1, s2, df) shingle stream.

    ``spread_explode``: redistribute the pair lists before the candidate
    explode (same AQE-coalesce rationale as the single-scan path). Gated
    because the extra exchange is pure fixed latency at bench scale where
    the whole candidate set fits one task anyway; the caller turns it on
    from the same size estimate that picks the plan shape."""
    sizes = sh_ok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ds = F.array_sort(F.collect_list("doc_id"))
    pair_lists = (
        sh_ok.where(F.col("df") >= 2)
        .groupBy("s1", "s2")
        .agg(ds.alias("ds"))
        .where(F.size("ds") >= 2)
    )
    if spread_explode:
        pair_lists = pair_lists.repartition(
            sh_ok.sparkSession.sparkContext.defaultParallelism, "s1", "s2"
        )
    combos = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> "
        "struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        pair_lists.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    # LEFT joins, not inner (round 15, guide §2.4): an INNER size attach
    # pushes IsNotNull(doc_id) into the size table's subtree all the way
    # down to the scan, which makes the sizes branch's scan + split +
    # shingle + hash + exchange chain canonicalize differently from the
    # pair branch's — AQE then materializes BOTH chains (3 parquet scans
    # in the final plan). With LEFT joins nothing is pushed, the probe
    # exchange is reused, and the whole sizes branch reads the already-
    # materialized shingle stage (2 scans; plan evidence in
    # plans/r15/ngram_jaccard_after.txt). Value-identical either way:
    # every inter row's docs own >= 1 capped shingle so the join always
    # matches, and even a hypothetical miss yields NULL jaccard, which
    # the >= threshold filter drops exactly like the inner join did.
    # Bench-neutral at sf0.1 (idle cores hid the duplicate chain:
    # interleaved medians 1.326 vs 1.317 s); at corpus scale the removed
    # chain is a full extra pass over the input.
    return (
        inter.join(F.broadcast(sa), "doc_a", "left")
        .join(F.broadcast(sb), "doc_b", "left")
        .select("doc_a", "doc_b", quantize(j, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def contamination_check(
    df: DataFrame,
    bench_pred: Column,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: which corpus documents share word-3-gram
    shingles with a held-out benchmark set (``bench_pred`` selects the
    benchmark rows) — the overlap check every training pipeline runs
    before releasing a dataset.

    Plan: the benchmark / candidate split happens BEFORE the shingle
    explode — each side is a filtered scan exploded once, so the corpus
    is exploded exactly once on the candidate side and the (tiny,
    pushdown-pruned) benchmark side separately. The earlier form exploded
    the WHOLE corpus on both sides and filtered afterwards via doc_id
    joins (4 scans, 2 full explodes in the plan). The shingle equi-join
    then broadcasts the BENCHMARK side (benchmarks are small by
    construction), and one aggregate per contaminated doc finishes. No
    O(n²) anywhere; candidate text never moves — only (doc_id, shingle)
    pairs. The candidate filter is NULL-safe-negated so rows where
    ``bench_pred`` is NULL stay candidates (matching the anti-join
    semantics of the membership formulation)."""
    bench_sh = shingle_rows(df.where(bench_pred), text_col).select(
        F.col("doc_id").alias("bench_doc"), "s"
    )
    cand_sh = shingle_rows(
        df.where(F.coalesce(~bench_pred, F.lit(True))), text_col
    )
    return (
        cand_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("bench_doc").alias("n_benchmark_docs"),
        )
    )


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_iter: int = 50,
    algorithm: str = "propagate",
) -> DataFrame:
    """Dedup CLUSTERS from a near-dup pair graph: every document that
    appears in ≥1 pair gets ``cluster_id`` = the smallest doc_id reachable
    through the pair edges (connected components by min-label).

    Production dedup needs this step — pairwise output alone double-counts
    (A~B, B~C must collapse to one keeper, even when A~C was never
    emitted). Two algorithms, property-tested equal:

    - ``"propagate"`` (default): iterative min-label propagation — each
      round every node takes the min of its own and its neighbors'
      labels; fixpoint after ``diameter`` rounds. Right for near-dup
      graphs, whose clusters are shallow (planted chains here converge
      in ≤3 rounds).
    - ``"star"``: the alternating large-star/small-star formulation
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      SoCC'14) — each round hooks every node to the minimum of its
      neighborhood, which HALVES long paths instead of shortening them
      by one: O(log n) rounds on any diameter, the web-scale choice
      when components can be deep (URL graphs, co-citation). Same join
      shape per round (edge ⋈ per-node min), one extra exceptAll for
      the convergence check.

    Each round materializes via ``localCheckpoint`` to truncate lineage
    (else the plan doubles per iteration).

    The declared query's oracle computes the identical fixpoint as a
    DuckDB recursive CTE (transitive closure + min per node) — exact
    parity for a genuinely iterative algorithm, whichever plan ran.
    """
    if algorithm == "star":
        return _connected_components_star(pairs, a, b, max_iter)
    if algorithm != "propagate":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    e = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("lbl").alias("nl"))
        )
        new = (
            labels.join(neigh, labels["node"] == neigh["u"], "left")
            .select(
                "node",
                F.col("lbl").alias("prev"),
                F.least(F.col("lbl"), F.coalesce("nl", "lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.where(F.col("lbl") != F.col("prev")).count()
        labels = new.select("node", "lbl")
        if changed == 0:
            break
    else:
        # Falling through with changed > 0 would silently return WRONG
        # labels (a component wider than max_iter rounds not yet merged).
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or switch "
            "to the large-star/small-star formulation"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def _connected_components_star(
    pairs: DataFrame, a: str, b: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star rounds to a star-graph fixpoint
    (each component collapses to edges pointing at its minimum node).

    Per round, both phases are the SAME bounded shape: a per-node MIN
    aggregate joined back onto the edge list — no neighbor lists are
    ever collected, so a hub of any degree costs one partial-aggregated
    min, not a collect_list. large-star hooks every bigger-than-u
    neighbor to min(Γ(u) ∪ {u}); small-star re-hooks the smaller ones;
    paths halve every round (O(log n) rounds at any diameter).
    Convergence = edge set unchanged (two exceptAll counts on the
    checkpointed frames — exact, and at fixpoint both are empty)."""
    e0 = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    # directed big -> small, deduped: the invariant both phases preserve
    edges = (
        e0.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select("u")
        .union(e0.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # ---- large-star: for every node u, m = min(neighbors ∪ {u});
        # every neighbor v > u re-hooks to m
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: edges now run big -> small; for each u,
        # m = min of its smaller neighbors; every smaller neighbor and u
        # itself hook to m
        m2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(m2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            small.exceptAll(edges).count() + edges.exceptAll(small).count()
        )
        edges = small
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components(star): no fixpoint after {max_iter} "
            f"rounds ({changed} edge diffs); raise max_iter"
        )
    # star fixpoint: every non-center points at its component minimum;
    # centers have no outgoing edge and label themselves
    lbl = edges.groupBy("u").agg(F.min("v").alias("lbl"))
    return (
        nodes.join(lbl, nodes["node"] == lbl["u"], "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("lbl", "node").alias("cluster_id"),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str = "n_chars",
    max_iter: int = 50,
    algorithm: str = "propagate",
) -> DataFrame:
    """End-to-end dedup DECISIONS: pair graph → connected components →
    one keeper per cluster, everything else marked for drop. Pairwise
    output alone is not actionable (A~B, B~C must collapse to ONE kept
    document); this is the step that turns near-dup mining into a
    training-set filter.

    Keeper rule (deterministic): highest ``quality_col``, ties broken by
    smallest ``doc_id``. Scale shape: components via min-label propagation
    (see ``connected_components``), then ONE broadcast-sized join of the
    cluster labels to the quality column and a per-cluster argmax window —
    the window partitions on ``cluster_id`` (no global ordering), and only
    documents that appear in ≥1 pair enter the join (near-dup clusters are
    a small fraction of any real corpus, so the labeled side is sparse).
    """
    cc = connected_components(pairs, max_iter=max_iter, algorithm=algorithm)
    labeled = cc.join(df.select("doc_id", quality_col), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(quality_col), F.asc("doc_id")
    )
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            (F.col("__rn") == 1).alias("keep"),
        )
    )


_SWAR_MASK = 0x0001000100010001  # one 16-bit counting lane per mask bit
_SWAR_LANE_LIMIT = 65535  # max shingles/doc before a 16-bit lane overflows


def _simhash_agg(df: DataFrame, text_col: str) -> DataFrame:
    """SWAR vertical-popcount aggregate shared by ``simhash_signatures``
    and ``simhash_near_dup_pairs``: one row per document with the shingle
    count ``__n`` and 16 packed lane sums ``w0..w15``.

    The 64-bit shingle hash (md5 prefix, parsed with TWO conv() calls —
    c0 = digits 1-8 in bits 32-63, c1 = digits 9-16 in bits 0-31) is
    AND-masked into four 16-bit counting lanes (``0x0001000100010001``)
    at each of 16 shift offsets, so ONE hash aggregate carries 16 packed
    BIGINT sums + a count instead of 64 per-bit sums — 17 agg buffer
    slots vs 64, which halves both per-row work and the Janino compile
    of the generated aggregate. Lane arithmetic is exact as long as
    every per-bit count fits 16 bits (enforced downstream via
    ``_swar_guard``); the packed sum may wrap Long.MAX via lane 48 —
    harmless: lanes are extracted with ``shiftrightunsigned``, and the
    session pins ANSI off so SUM wraps instead of erroring.
    """
    # cost=2: 16 SWAR shift-mask sums per shingle row (round-14 width
    # sweep: simhash64 median 1.11 s @width 3 → 0.84 s @16 at sf0.1).
    df = spread(df, cost=2)
    ex = shingle_rows(df, text_col, alias="tok").select(
        "doc_id", F.md5("tok").alias("__h")
    )
    h = F.shiftleft(
        F.conv(F.substring("__h", 1, 8), 16, 10).cast("bigint"), 32
    ).bitwiseOR(F.conv(F.substring("__h", 9, 8), 16, 10).cast("bigint"))
    hh = ex.select("doc_id", h.alias("__w"))
    # SQL-string form: ONE py4j parse per lane sum instead of ~6 Column
    # round-trips each — see _swar_bits on why driver-side construction
    # cost matters here.
    sums = [
        F.expr(f"sum(shiftrightunsigned(__w, {k}) & {_SWAR_MASK}) AS w{k}")
        for k in range(16)
    ]
    return hh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"), *sums)


def _swar_bits_sql(j0: int, n_bits: int) -> str:
    """SQL string for a packed BIGINT of signature bits [j0, j0+n_bits)
    from the SWAR lane columns, LSB = bit j0 — a majority vote
    ``2*ones > __n`` per bit.

    Why a GENERATED SQL STRING and not pyspark Column algebra: this
    expression family is instantiated 10× per query (two 32-bit halves +
    eight 8-bit band keys), and building it from Column calls costs
    hundreds of Python↔JVM py4j round-trips — measured at ~1.8 s of
    driver-side DataFrame CONSTRUCTION per call (data-size-independent;
    Catalyst itself was only ~0.3 s), the dominant cost of the whole
    simhash family at sf0.1. One ``F.expr`` parse of a generated string
    is a single round-trip; the JVM-side SQL parser handles the rest.

    Why the bit terms are EXPANDED (one ``if()`` per bit with every
    position literal precomputed in Python) rather than a compact
    ``transform``/``aggregate`` lambda over a bit sequence: Spark's
    higher-order functions are CodegenFallback — interpreted per
    element — and the interpreted vote loop cost ~1.2 s of executor
    time at sf0.1 where the codegen'd expanded sum costs ~0.1 s. String
    expansion is free at construction; what matters is that the PARSED
    tree is plain comparisons/adds that whole-stage codegen compiles.

    Position math mirrors the hex layout: signature bit j lives at
    packed-word position q = (60 if j < 32 else 28) - 4*((j%32)//4) +
    (j%32)%4 — digit-major big-endian within each 32-bit conv() half,
    c0 half shifted up 32; lane word q%16, lane shift 16*(q//16).
    Values are identical to the per-digit formulation the oracle SQL
    uses: hex digit k of the md5 prefix contributes bits ``4*(7-k)+r``
    of each 32-bit half, and majority is the strict ``2*ones > n``
    (ties → 0), exactly ``sum(±1) > 0``.
    """
    terms = []
    for j in range(j0, j0 + n_bits):
        jj = j % 32
        q = (60 if j % 64 < 32 else 28) - 4 * (jj // 4) + jj % 4
        # lane prefix: bits 0-63 live in the w0..w15 sums (md5 hex
        # digits 1-16); bits 64-127 in the x0..x15 sums (digits 17-32,
        # the simhash128 second lane) with identical in-lane layout
        pre = "w" if j < 64 else "x"
        lane, shift, weight = q % 16, 16 * (q // 16), 2 ** (j - j0)
        terms.append(
            f"if(2 * (shiftrightunsigned({pre}{lane}, {shift}) & 65535)"
            f" > __n, {weight}L, 0L)"
        )
    return "(" + " + ".join(terms) + ")"


def _swar_half(j0: int, alias: str) -> Column:
    """Guarded 32-bit signature half: ``assert_true`` keeps every 16-bit
    counting lane exact (> 65535 distinct shingles in ONE document means
    ~verbatim-unique text that no near-dup pass should fingerprint
    whole; chunk first). Routing the value through the if(... is null)
    keeps the guard from being pruned as an unused column."""
    return F.expr(
        f"if(assert_true(__n <= {_SWAR_LANE_LIMIT}) is null, "
        f"cast(({_swar_bits_sql(j0, 32)}) as bigint), null) AS {alias}"
    )


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document as a 64-char bit string.

    Features are distinct word 3-gram shingles (not unigram tokens: on a
    small shared vocabulary every document uses nearly the same token SET,
    which collapses unigram SimHash — shingles carry sequence information).
    Per shingle, md5 supplies 64 bits; bit j of the signature is the
    majority vote over shingles. Aggregation and bit-assembly mechanics:
    ``_simhash_agg`` / ``_swar_bits``.
    """
    agg = _simhash_agg(df, text_col)
    packed = agg.select(
        "doc_id", _swar_half(0, "sh_lo"), _swar_half(32, "sh_hi")
    )
    # Bit string rendered from the integer halves (LSB-first to match the
    # j-ascending definition) — 6 string ops instead of 64 CASE branches.
    bits = F.concat(
        F.reverse(F.lpad(F.conv(F.col("sh_lo").cast("string"), 10, 2), 32, "0")),
        F.reverse(F.lpad(F.conv(F.col("sh_hi").cast("string"), 10, 2), 32, "0")),
    )
    return packed.select(
        "doc_id", bits.alias("simhash_bits"), "sh_lo", "sh_hi"
    )


# Above this estimated input size the simhash pair stage switches from
# in-row expression combos to the Arrow popcount kernel (see
# simhash_near_dup_pairs) — the interpreted O(occupancy^2) term crosses
# the fixed Arrow/worker overhead around this scale (estimates are
# COMPRESSED parquet bytes: ~0.6 MB at sf0.1 where the expression path
# wins 1.5 s vs 3.2 s, ~4 MB at sf1 where the kernel wins 5.8 s vs 13 s).
SIMHASH_KERNEL_BYTES = 2 << 20

# Above this estimated input size the pair stage switches again, from the
# 8-bit-band Arrow kernel to multi-index hashing (see _simhash_mih_pairs):
# 8-bit bands have only 256 values, so bucket occupancy — and the
# occupancy² pair term — grows linearly with the corpus no matter how the
# work is kernelized (measured: 487 s at sf10/500k docs, ~2000 docs per
# bucket). MIH swaps the geometry for 4×16-bit bands + single-bit-flip
# variant keys: 65536 bucket values, occupancy n/65536, identical final
# pair set. Crossover: the kernel path wins below ~50k docs (its emit
# volume is 8 rows/doc vs MIH's 68), MIH wins above.
SIMHASH_MIH_BYTES = 16 << 20

SIMHASH_BANDS = 8  # 8 disjoint 8-bit bands of the 64-bit signature
SIMHASH_MAX_HAMMING = 7  # must stay < SIMHASH_BANDS for the recall guarantee

# MIH planned-compare refusal (round 13). The sixth-decade measurement
# (SCALING.md: 30M fingerprints, in-process interleaved vs the 10M
# point) showed the band-collision term taking over: wall grew 10.7×
# on 3× data, tracking the PREDICTED per-bucket compare volume (~11.5×)
# almost exactly — with 16-bit bands the candidate term is Θ(n²/2^16)
# per band no matter how the work is kernelized or how s distributes
# it. That term is invisible to input bytes AND to the s-growth rule
# (which bounds rows per task, not compares per corpus), but it is
# computable EXACTLY before any pair task launches from the per-band
# bucket histogram — a BOUNDED collect (≤ groups·bands·2^16 rows ≈
# 2 MB, the band-value domain, never the corpus). Inputs past
# MIH_PROBE_MIN_DOCS pay that one column-pruned agg; plans above
# MIH_MAX_COMPARES refuse naming the remedies (exact-dedup identical
# fingerprints — one mass-dup value of c docs plans c²/2 compares from
# a single bucket — shard the corpus, or raise the budget after sizing
# the cluster). 1e12 compares ≈ 35 min on this box's 32 cores; the
# measured 30M corpus plans ~4.7e11 and passes.
MIH_PROBE_MIN_DOCS = 2_000_000
MIH_MAX_COMPARES = 1e12


def _mih_planned_compares(c, width: int, s: int) -> float:
    """EXACT planned popcount-compare count for one band's dense exact
    histogram ``c`` (length 2^width), mirroring the three kernel loops:
    within-bucket exact×exact triangles, exact×variant top-bit
    neighbors (variant emitted only when the flipped bit is SET in the
    origin, landing in the cleared bucket), and low-bit neighbor
    exact×exact compares evaluated once (v < v^bit)."""
    import numpy as np

    low = width - s
    idx = np.arange(c.shape[0], dtype=np.int64)
    total = float((c * np.maximum(c - 1.0, 0.0)).sum() / 2.0)
    for i in range(low, width):
        m = ((idx >> i) & 1) == 0
        total += float((c[idx[m]] * c[idx[m] + (1 << i)]).sum())
    for t in range(low):
        m = ((idx >> t) & 1) == 0
        total += float((c[idx[m]] * c[idx[m] + (1 << t)]).sum())
    return total


def _np_pop64(x):
    """Branch-free SWAR popcount over a uint64 ndarray (same constants as
    the in-kernel copy in simhash_near_dup_pairs)."""
    import numpy as np

    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return (x * h) >> np.uint64(56)


def mih_bands(max_hamming: int) -> int:
    """Band count for the MIH geometry: the WIDEST single-flip-feasible
    bands. Pigeonhole over b bands: a pair at Hamming ≤ h has some band
    at distance ≤ floor(h/b); the kernel matches band distance 0
    (exact×exact) and 1 (exact×single-flip-variant), so feasibility
    needs floor(h/b) ≤ 1, i.e. b ≥ floor(h/2)+1. Subject to that, WIDER
    bands are strictly better at every corpus size: occupancy is
    n/2^(64/b) (each halving of b squares the bucket count) while keys
    per doc b·(1+64/b) = b+64 barely moves (66 at b=2 vs 68 at b=4).
    So the width knob is RADIUS-bound, not corpus-bound — the widest
    feasible geometry wins wherever the MIH plan is selected at all
    (the corpus-size decision is the SIMHASH_MIH_BYTES gate upstream):

    - h ≤ 3 → 2×32-bit bands, occupancy n/2^32: a TRILLION-doc corpus
      averages < 1 doc per bucket — third-decade-safe outright.
    - h 4..7 → 4×16-bit bands, occupancy n/65536: the h ≤ 7 contract's
      widest single-flip geometry. Growing past ~10^8 docs means either
      trading the radius down to ≤ 3 (the n_bands knob precedent) or
      paying r = 2 variant enumeration (C(w,2) keys/doc) — documented
      in SCALING.md, not silently attempted.
    - h ≥ 8 never reaches MIH (the dispatch keeps the banded kernel).
    """
    for b in (2, 4):
        if max_hamming // b <= 1:
            return b
    raise ValueError(
        f"max_hamming={max_hamming} exceeds the single-flip MIH radius"
    )


def _simhash_mih_pairs(
    agg: DataFrame,
    max_hamming: int,
    n_docs: int | None = None,
    max_compares: float | None = None,
) -> DataFrame:
    """Multi-index-hashing pair stage (Norouzi/Punjani/Fleet, CVPR'12):
    the corpus-scale plan shape for simhash_near_dup_pairs, value-equal
    to the banded plans.

    Geometry: the 64-bit signature splits into ``mih_bands(max_hamming)``
    disjoint w-bit bands (w = 64/b) with per-band search radius
    r = max_hamming // b (0 or 1 — callers with max_hamming > 7 stay on
    the banded kernel). Pigeonhole: if every band differed in ≥ r+1 bits
    the total distance would be ≥ b(r+1) > max_hamming, so every
    qualifying pair agrees with some band to within r bits. The final
    pair set is exactly {a<b : hamming ≤ max_hamming} — identical to the
    other two plan shapes (asserted in tests/test_properties.py).

    Transport shape (the third-decade rebuild): the Arrow task key is
    (band, __sub) where __sub is the TOP s bits of the band value, so a
    task owns a contiguous 2^(w-s)-value slice of one band's bucket
    space. Band-distance-1 pairs whose differing bit is one of the LOW
    w-s bits live in the SAME task already — the kernel finds them by
    comparing bucket v with bucket v^bit in-memory, no variant row
    needed. Only the s TOP-bit flips cross task boundaries, so each doc
    emits 1+s keys per band instead of 1+w: at w=16/s=8 the exploded
    row volume drops 17→9 per doc-band (47%), at w=32/s=8 33→9 (73%),
    and each low-bit neighbor compare runs ONCE (v < v^bit ordering)
    instead of twice (both variant orientations) — the quadratic
    kernel term roughly halves on top of the transport saving
    (measured at sf30/1.5M docs: 114 s → see SCALING.md third decade).

    The kernel sorts its slice by (band_val, kind) and walks buckets
    via np.unique boundaries — no per-bucket pandas groupby. For each
    bucket v with exact rows E(v) and cross-sub variant rows V(v):
    E(v)×E(v) upper triangle (band distance 0), E(v)×V(v) (top-bit
    distance 1; found in both orientations across the two subs, deduped
    by the final pair groupBy), and E(v)×E(v^bit) for each low bit with
    v < v^bit (low-bit distance 1, found once). Verification is always
    the full 64-bit SWAR popcount, so over-generation is impossible.

    The repartition between signature assembly and key emit is a
    deliberate exchange barrier: without it CollapseProject inlines the
    full SWAR majority-vote expression into all b·(1+s) variant-key
    expressions and Catalyst planning alone costs seconds
    (data-size-independent; same pathology as deriving band keys from
    sh_lo/sh_hi in the banded plan, see simhash_near_dup_pairs).
    """
    import numpy as np
    import pandas as pd

    b = mih_bands(max_hamming)
    w = 64 // b
    mask = (1 << w) - 1
    r = max_hamming // b
    # Sub-bit count s: tasks = b·2^s. Floor-first sizing (round 11,
    # ported from the media twin's A/B — s = 4 measured ~10% faster
    # than the old s = 8 start at 1.8M assets): start at the s = 4
    # small-corpus floor (16 tasks/band; near-empty bucket slices pay
    # one applyInPandas group call each, measured ~1.7 s of pure
    # per-group overhead on 6k rows) and GROW only while the
    # ~500k-rows-per-task target is exceeded — fewer sub bits ship
    # fewer variant rows per doc (1 + s/2 expected per doc-band, see
    # the set-bit rule below) while the extra in-task neighbor-bit
    # compares stay NumPy-cheap. Any s in [1, w-1] is value-exact;
    # s ≤ w-1 keeps at least one low bit in-task.
    s = min(4, w - 1)
    if n_docs:
        while s < min(w - 1, 16) and n_docs * (2 + s) * b > 1_000_000 * b * (1 << s):
            s += 1
    low = w - s
    sigs = agg.select(
        "doc_id", _swar_half(0, "sh_lo"), _swar_half(32, "sh_hi")
    ).repartition("doc_id")
    # PLANNED-COMPARE refusal (round 13, the sixth-decade finding — see
    # MIH_MAX_COMPARES): one column-pruned per-band bucket histogram
    # (bounded collect ≤ b·2^w rows, the band-value domain) feeds the
    # exact kernel compare term before any pair task launches. Applies
    # to the 16-bit geometry only: 32-bit bands (h ≤ 3) have occupancy
    # n/2^32 and their collision term stays under 1e12 compares until
    # ~4e10 docs — far past a single job's corpus.
    budget = MIH_MAX_COMPARES if max_compares is None else max_compares
    if w == 16 and n_docs and n_docs >= MIH_PROBE_MIN_DOCS:
        import numpy as _np

        hsts = []
        for k in range(b):
            src = "sh_lo" if (k + 1) * w <= 32 else "sh_hi"
            shift = (k * w) % 32
            hsts.append(
                f"struct({k} AS band,"
                f" (shiftrightunsigned({src}, {shift}) & {mask}) AS v)"
            )
        rows = (
            sigs.select(
                F.explode(F.expr("array(" + ",".join(hsts) + ")")).alias(
                    "bk"
                )
            )
            .groupBy(F.col("bk.band").alias("band"), F.col("bk.v").alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        planned = 0.0
        for k in range(b):
            c = _np.zeros(1 << w, dtype=_np.float64)
            for row in rows:
                if row["band"] == k:
                    c[int(row["v"])] = float(row["c"])
            planned += _mih_planned_compares(c, w, s)
        if planned > budget:
            raise ValueError(
                f"simhash MIH planned compare volume {planned:.2e} exceeds "
                f"max_compares={budget:.0e} at the {b}×{w}-bit band "
                f"geometry: band-collision work is Θ(n²/2^{w}) per band "
                f"and this corpus's bucket histogram concentrates it "
                f"(mass-duplicate or low-entropy signatures are the usual "
                f"cause — ONE signature value with c docs plans c²/2 "
                f"compares from a single bucket). Exact-dedup identical "
                f"signatures first, shard the corpus, or raise "
                f"max_compares after sizing the cluster."
            )
    # Key encoding: ONE bigint ``bvk`` = band_val·2 + kind — the kind
    # flag rides the low bit, so the kernel sorts a single key (exacts
    # land before variants of the same bucket for free) and one shipped
    # column replaces two. SET-BIT variant rule: a top-bit flip emits a
    # variant key only when the flipped bit is SET in the origin (the
    # variant is a value DECREASE). A band-distance-1 pair differs in
    # exactly that bit, so exactly one side has it set — the set side
    # casts the variant into the cleared side's bucket, every pair is
    # still met (full recall) but in exactly ONE orientation: expected
    # variant volume halves (s/2 per doc-band, uniform bits) and the
    # duplicated-discovery kernel work the old both-orientations
    # transport paid disappears with it.
    structs = []
    for k in range(b):
        # band k covers signature bits [k·w, (k+1)·w); sh_lo holds bits
        # 0..31, sh_hi bits 32..63 (w ∈ {16, 32} always nests in one half)
        src = "sh_lo" if (k + 1) * w <= 32 else "sh_hi"
        shift = (k * w) % 32
        bv = f"(shiftrightunsigned({src}, {shift}) & {mask})"
        structs.append(
            f"struct({k} AS band, cast({bv} * 2 as bigint) AS bvk)"
        )
        if r >= 1:
            structs.extend(
                f"if((shiftrightunsigned({bv}, {i}) & 1) = 1,"
                f" struct({k} AS band,"
                f" cast(({bv} ^ {1 << i}) * 2 + 1 as bigint) AS bvk),"
                " null)"
                for i in range(low, w)
            )
    ex = (
        sigs.select(
            "doc_id",
            "sh_lo",
            "sh_hi",
            F.explode(
                F.expr(
                    "filter(array(" + ",".join(structs) + "),"
                    " x -> x is not null)"
                )
            ).alias("bk"),
        )
        .select("doc_id", "sh_lo", "sh_hi", "bk.band", "bk.bvk")
    )

    _EMPTY = {
        "doc_a": pd.Series(dtype="int64"),
        "doc_b": pd.Series(dtype="int64"),
        "hamming": pd.Series(dtype="int64"),
    }
    in_task_bits = low if r >= 1 else 0

    def _mih_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        bvk = pdf["bvk"].to_numpy()
        order = np.argsort(bvk, kind="stable")
        bvk = bvk[order]
        vals = bvk >> 1
        ids = pdf["doc_id"].to_numpy()[order]
        lo_v = pdf["sh_lo"].to_numpy()[order].astype(np.uint64)
        hi_v = pdf["sh_hi"].to_numpy()[order].astype(np.uint64)
        uvals, starts = np.unique(vals, return_index=True)
        bounds = np.append(starts, len(vals))
        # the packed key sorts exacts (kind bit 0) before variants of
        # the same bucket, so the exact segment is a prefix
        n_exact = np.searchsorted(bvk, uvals * 2 + 1, side="left") - starts
        idx = {int(v): i for i, v in enumerate(uvals)}
        outs = [pd.DataFrame(_EMPTY)]

        def emit(ham, mask_m, ids_r, ids_c):
            rr, cc = np.nonzero(mask_m)
            if len(rr):
                a = ids_r[rr]
                bb = ids_c[cc]
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_a": np.minimum(a, bb),
                            "doc_b": np.maximum(a, bb),
                            "hamming": ham[rr, cc],
                        }
                    )
                )

        for i in range(len(uvals)):
            s0, s1 = bounds[i], bounds[i + 1]
            n_e = int(n_exact[i])
            if n_e == 0:
                continue
            # (1) bucket-local: exact×exact triangle + exact×variant
            if s1 - s0 >= 2:
                cols = np.arange(s1 - s0)[None, :]
                for c0 in range(0, n_e, 4096):
                    c1 = min(c0 + 4096, n_e)
                    ham = (
                        _np_pop64(lo_v[s0 + c0 : s0 + c1, None] ^ lo_v[None, s0:s1])
                        + _np_pop64(hi_v[s0 + c0 : s0 + c1, None] ^ hi_v[None, s0:s1])
                    ).astype(np.int64)
                    rows = np.arange(c0, c1)[:, None]
                    m = (
                        ((cols < n_e) & (rows < cols)) | (cols >= n_e)
                    ) & (ham <= max_hamming)
                    emit(ham, m, ids[s0 + c0 : s0 + c1], ids[s0:s1])
            # (2) low-bit neighbor buckets, each unordered pair once
            v = int(uvals[i])
            for t in range(in_task_bits):
                u = v ^ (1 << t)
                if u < v:
                    continue
                j = idx.get(u)
                if j is None:
                    continue
                t0 = bounds[j]
                n_e2 = int(n_exact[j])
                if n_e2 == 0:
                    continue
                for c0 in range(0, n_e, 4096):
                    c1 = min(c0 + 4096, n_e)
                    ham = (
                        _np_pop64(
                            lo_v[s0 + c0 : s0 + c1, None]
                            ^ lo_v[None, t0 : t0 + n_e2]
                        )
                        + _np_pop64(
                            hi_v[s0 + c0 : s0 + c1, None]
                            ^ hi_v[None, t0 : t0 + n_e2]
                        )
                    ).astype(np.int64)
                    m = ham <= max_hamming
                    emit(ham, m, ids[s0 + c0 : s0 + c1], ids[t0 : t0 + n_e2])
        return pd.concat(outs, ignore_index=True)

    coarse = ex.withColumn(
        "__sub", F.expr(f"shiftrightunsigned(bvk, {low + 1})")
    )
    return (
        coarse.groupBy("band", "__sub")
        .applyInPandas(_mih_kernel, "doc_a long, doc_b long, hamming long")
        .groupBy("doc_a", "doc_b")
        .agg(F.max("hamming").alias("hamming"))
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = SIMHASH_MAX_HAMMING,
    n_bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """SimHash near-dup pairs over the WHOLE corpus: Hamming distance ≤
    ``max_hamming``, blocked on signature prefix bands with guaranteed
    recall (Manku/Jain/Sarma-style, WWW'07).

    Band math (pigeonhole): the 64-bit signature splits into 8 disjoint
    8-bit bands. A pair at Hamming distance h has its h differing bits in
    at most h distinct bands, so for h ≤ 7 at least one of the 8 bands is
    IDENTICAL in both signatures — every qualifying pair is guaranteed to
    collide in ≥1 band bucket. The blocked result therefore EQUALS the
    all-pairs definition, which is exactly what the (brute-force, sf0.01)
    oracle SQL computes. On the test corpus the planted near-dup pairs
    have Hamming 1–7 and the closest non-planted pair is at 16 — the
    operator returns precisely the planted set.

    Scale shape: one signature pass (pure projection + one hash agg), an
    8-way band explode (narrow), one groupBy on (band, band_val) with
    in-row a<b pair generation — no self-join, so the signature subtree is
    evaluated once. A band bucket is a 1/256 slice of signature space
    (~n/256 docs uniform); corpora with mass-duplication clusters should
    run ``exact_dedup_groups`` first — k identical signatures in a bucket
    are exact duplicates, not near-duplicates. Pairs colliding in several
    bands are deduped by a groupBy on the pair key (hamming is identical
    in every collision, so any-value aggregation is exact).

    The 8-bit band keys are assembled straight from the SWAR lane sums
    (``_swar_bits(8k, 8)``) in the SAME projection that assembles
    sh_lo/sh_hi — deriving them from sh_lo/sh_hi instead makes
    CollapseProject inline 4+ copies of each 32-bit assembly expression
    into the band array, and the resulting Catalyst planning time (~1.4s
    per call, data-size-independent) dominated the whole operator at
    sf0.1. Band k of the signature equals bits [8k, 8k+8) in both
    formulations, so blocked-pair results are unchanged.

    ``n_bands`` is the SCALE knob (must divide 64; the guarantee needs
    ``max_hamming < n_bands``): a band bucket holds ~n / 2^(64/n_bands)
    docs, and the in-bucket pair term grows with occupancy², so growing
    the corpus 2^k× while keeping bucket occupancy — and therefore
    per-task pair work — constant means WIDENING bands by k bits (fewer,
    wider bands), trading down the guaranteed Hamming radius: 8×8-bit
    bands guarantee h≤7 at ~n/256 occupancy; 4×16-bit bands guarantee
    h≤3 at ~n/65536. Measured in SCALING.md (7.1× time at 10× corpus
    with the default geometry — the quadratic term, not the shuffle, is
    what the knob controls).
    """
    if 64 % n_bands != 0:
        raise ValueError("band width must divide the 64-bit signature")
    if max_hamming >= n_bands:
        raise ValueError("recall guarantee needs max_hamming < n_bands")
    width = 64 // n_bands
    agg = _simhash_agg(df, text_col)
    # CORPUS-SCALE plan: multi-index hashing (b wide bands + 1-bit-flip
    # variant keys; ``mih_bands`` picks the widest single-flip-feasible
    # geometry from the radius — 2×32-bit at h ≤ 3, 4×16-bit at h ≤ 7).
    # The pair set is the same {hamming ≤ max_hamming} regardless of
    # geometry — every plan shape has full recall — so the switch is
    # purely a cost decision; see _simhash_mih_pairs. Only radii ≤ 7
    # keep the variant enumeration at one flip per band. The count()
    # job sizes the Arrow transport granularity (trivial next to the
    # pair stage it sizes — the resolve_planes convention).
    if max_hamming <= 7 and _estimated_bytes(df) >= SIMHASH_MIH_BYTES:
        return _simhash_mih_pairs(agg, max_hamming, n_docs=df.count())
    bands = F.expr(
        "array("
        + ",".join(
            f"struct({k} AS band, ({_swar_bits_sql(width * k, width)})"
            " AS band_val)"
            for k in range(n_bands)
        )
        + ")"
    )
    ex = agg.select(
        "doc_id",
        _swar_half(0, "sh_lo"),
        _swar_half(32, "sh_hi"),
        F.explode(bands).alias("bk"),
    ).select("doc_id", "sh_lo", "sh_hi", "bk.band", "bk.band_val")
    # Size-gated pair stage (the ngram_jaccard two-plan-shapes precedent;
    # value-identical either way, asserted in tests):
    #
    # - SMALL inputs (estimated < SIMHASH_KERNEL_BYTES): in-row expression
    #   combos per bucket. The interpreted per-pair cost is small when
    #   bucket occupancy is, and the no-Python plan avoids ~1.3 s of
    #   Arrow/worker overhead at sf0.1.
    # - LARGE inputs: an Arrow applyInPandas kernel — numpy XOR + SWAR
    #   popcount over each bucket's signature vectors. The expression
    #   combos are CodegenFallback-interpreted and O(occupancy²) per
    #   bucket — measured 16.3 s at sf1 where the kernel measures ~6 s;
    #   the gap widens quadratically with occupancy.
    #
    # The Arrow GROUP is deliberately COARSER than the bucket: grouping
    # on the raw (band, band_val) ships one Arrow batch per bucket, and
    # the ~2.7 ms per-group Python round-trip made 2048 tiny buckets cost
    # 6 s at sf0.1. Instead the shuffle key is (band, band_val mod
    # sub_groups) — n_bands·sub_groups Arrow groups of ~n/sub_groups rows
    # — and the kernel sub-groups by exact band_val in pandas (C-speed,
    # no per-bucket round-trip). Same buckets, same pairs; only the
    # transport granularity changes. Size ``sub_groups`` so a task holds
    # ~500k rows (n_bands·sub_groups tasks must also cover the cluster).
    import numpy as np
    import pandas as pd

    if _estimated_bytes(df) < SIMHASH_KERNEL_BYTES:
        grp = (
            ex.groupBy("band", "band_val")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "sh_lo", "sh_hi"))
                ).alias("ds")
            )
            .where(F.size("ds") >= 2)
        )
        combos = F.expr(
            "flatten(transform(ds, (x, i) -> "
            "transform(slice(ds, i + 2, size(ds)), y -> "
            "struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
            "cast(bit_count(x.sh_lo ^ y.sh_lo) + "
            "bit_count(x.sh_hi ^ y.sh_hi) as bigint) AS hamming))))"
        )
        return (
            grp.select(F.explode(combos).alias("p"))
            .select("p.doc_a", "p.doc_b", "p.hamming")
            .where(F.col("hamming") <= max_hamming)
            .groupBy("doc_a", "doc_b")
            .agg(F.max("hamming").alias("hamming"))
        )

    sub_groups = 64

    def _pop64(x):
        m1 = np.uint64(0x5555555555555555)
        m2 = np.uint64(0x3333333333333333)
        m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
        h = np.uint64(0x0101010101010101)
        x = x - ((x >> np.uint64(1)) & m1)
        x = (x & m2) + ((x >> np.uint64(2)) & m2)
        x = (x + (x >> np.uint64(4))) & m4
        return (x * h) >> np.uint64(56)

    _EMPTY = {
        "doc_a": pd.Series(dtype="int64"),
        "doc_b": pd.Series(dtype="int64"),
        "hamming": pd.Series(dtype="int64"),
    }

    def _bucket_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [pd.DataFrame(_EMPTY)]
        for _, g in pdf.groupby("band_val", sort=False):
            if len(g) < 2:
                continue
            order = np.argsort(g["doc_id"].to_numpy())
            ids = g["doc_id"].to_numpy()[order]
            lo = g["sh_lo"].to_numpy()[order].astype(np.uint64)
            hi = g["sh_hi"].to_numpy()[order].astype(np.uint64)
            # chunk rows so the XOR matrix stays ~4096·occupancy int64s
            # even on a pathological mass-duplicate bucket
            for c0 in range(0, len(ids), 4096):
                c1 = min(c0 + 4096, len(ids))
                ham = (
                    _pop64(lo[c0:c1, None] ^ lo[None, :])
                    + _pop64(hi[c0:c1, None] ^ hi[None, :])
                ).astype(np.int64)
                rows = np.arange(c0, c1)[:, None]
                cols = np.arange(len(ids))[None, :]
                m = (rows < cols) & (ham <= max_hamming)
                r, c = np.nonzero(m)
                if len(r):
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_a": ids[r + c0],
                                "doc_b": ids[c],
                                "hamming": ham[r, c],
                            }
                        )
                    )
        return pd.concat(outs, ignore_index=True)

    coarse = ex.withColumn("__sub", F.pmod("band_val", F.lit(sub_groups)))
    return (
        coarse.groupBy("band", "__sub")
        .applyInPandas(
            _bucket_kernel, "doc_a long, doc_b long, hamming long"
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("hamming").alias("hamming"))
    )


def _simhash128_agg(df: DataFrame, text_col: str) -> DataFrame:
    """Two-lane SWAR aggregate for 128-bit SimHash (round 13): the full
    md5 supplies 128 bits per shingle — hex digits 1-16 feed lane __w
    (identical to ``_simhash_agg``), digits 17-32 feed lane __x with the
    SAME in-lane layout — so one hash aggregate carries 32 packed
    BIGINT sums (w0..w15, x0..x15) + the count. Everything downstream
    (``_swar_bits_sql`` with its j ≥ 64 → x-prefix rule, ``_swar_half``)
    reads both lanes through one position formula."""
    # cost=4: 32 SWAR shift-mask sums per shingle row — twice the
    # 64-bit lane count (round-14 width sweep: simhash128 median 1.48 s
    # @width 3 → 0.99 s @16 at sf0.1).
    df = spread(df, cost=4)
    ex = shingle_rows(df, text_col, alias="tok").select(
        "doc_id", F.md5("tok").alias("__h")
    )

    def _lane(d0: int):
        return F.shiftleft(
            F.conv(F.substring("__h", d0, 8), 16, 10).cast("bigint"), 32
        ).bitwiseOR(
            F.conv(F.substring("__h", d0 + 8, 8), 16, 10).cast("bigint")
        )

    hh = ex.select("doc_id", _lane(1).alias("__w"), _lane(17).alias("__x"))
    sums = [
        F.expr(
            f"sum(shiftrightunsigned(__{p}, {k}) & {_SWAR_MASK}) AS {p}{k}"
        )
        for p in ("w", "x")
        for k in range(16)
    ]
    return hh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"), *sums)


def simhash128_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """128-bit SimHash per document (round 13): the tight-radius
    fingerprint that makes WIDE MIH bands feasible. Rationale from the
    sixth-decade measurement (SCALING.md round-13): 64-bit codes at
    h ≤ 7 force 4×16-bit bands, whose band-collision compare term is
    Θ(n²/2^16) per band and dominates wall past ~10M docs. 128-bit
    codes at the same absolute radius give 4×32-bit bands — the
    collision term drops 2^16× (~560× at the measured 30M corpus) and
    stays sub-dominant until ~4e10 docs. Output: the 128-char bit
    string plus four packed 32-bit halves (sh_0 = bits 0-31 ...
    sh_3 = bits 96-127, LSB-first like the 64-bit family)."""
    agg = _simhash128_agg(df, text_col)
    packed = agg.select(
        "doc_id",
        _swar_half(0, "sh_0"),
        _swar_half(32, "sh_1"),
        _swar_half(64, "sh_2"),
        _swar_half(96, "sh_3"),
    )
    bits = F.concat(
        *[
            F.reverse(
                F.lpad(
                    F.conv(F.col(f"sh_{i}").cast("string"), 10, 2), 32, "0"
                )
            )
            for i in range(4)
        ]
    )
    return packed.select(
        "doc_id", bits.alias("simhash_bits"), "sh_0", "sh_1", "sh_2", "sh_3"
    )


def simhash128_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 7,
    max_compares: float | None = None,
) -> DataFrame:
    """128-bit SimHash near-dup pairs, Hamming ≤ ``max_hamming`` over
    the whole corpus — the corpus-scale answer to the sixth-decade
    band-collision finding (see ``simhash128_signatures``). EXACT over
    its fingerprint: every plan shape has pigeonhole-guaranteed recall
    and full 128-bit popcount verification.

    Twin plans (the family convention; value-identical, test-asserted):
    - SMALL inputs (< SIMHASH_MIH_BYTES): the ORACLE-SHAPED plan —
      h ≤ 7 < 8 disjoint 16-bit bands means one band is IDENTICAL in
      any qualifying pair, so exact-match banding with in-row a<b
      combos suffices; no variant keys, no Python stage. (The 64-bit
      family's mid-size Arrow bucket kernel is unnecessary here: the
      8×16 geometry's occupancy is n/65536, not n/256, so the
      interpreted combo term stays trivial at every size this arm
      serves.)
    - LARGE inputs: 4×32-bit-band MIH with the set-bit variant
      transport and the two-lane popcount kernel
      (``_simhash128_mih_pairs``). The AVERAGE-occupancy collision term
      is Θ(n²/2^32) per band — under the 1e12 budget until ~4e10 docs —
      but average occupancy says nothing about CONCENTRATION: one
      mass-duplicated 128-bit signature of c docs still plans c²/2
      kernel compares from a single bucket at any band width, so the
      MIH arm runs a bounded heavy-bucket probe (round 14, per driver
      advice; see ``_simhash128_mih_pairs``) and refuses above
      ``max_compares`` (default ``MIH_MAX_COMPARES``).
    """
    if max_hamming > 7:
        raise ValueError(
            "simhash128_near_dup_pairs requires max_hamming <= 7: h > 7 "
            "needs 8×16-bit MIH bands — the 64-bit family's geometry and "
            "collision term; use simhash_near_dup_pairs' banding math"
        )
    agg = _simhash128_agg(df, text_col)
    if _estimated_bytes(df) >= SIMHASH_MIH_BYTES:
        return _simhash128_mih_pairs(
            agg, max_hamming, n_docs=df.count(), max_compares=max_compares
        )
    bands = F.expr(
        "array("
        + ",".join(
            f"struct({k} AS band, ({_swar_bits_sql(16 * k, 16)})"
            " AS band_val)"
            for k in range(8)
        )
        + ")"
    )
    ex = agg.select(
        "doc_id",
        _swar_half(0, "sh_0"),
        _swar_half(32, "sh_1"),
        _swar_half(64, "sh_2"),
        _swar_half(96, "sh_3"),
        F.explode(bands).alias("bk"),
    ).select(
        "doc_id", "sh_0", "sh_1", "sh_2", "sh_3", "bk.band", "bk.band_val"
    )
    grp = (
        ex.groupBy("band", "band_val")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("doc_id", "sh_0", "sh_1", "sh_2", "sh_3")
                )
            ).alias("ds")
        )
        .where(F.size("ds") >= 2)
    )
    ham = " + ".join(f"bit_count(x.sh_{i} ^ y.sh_{i})" for i in range(4))
    combos = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> "
        "struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        f"cast({ham} as bigint) AS hamming))))"
    )
    return (
        grp.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .where(F.col("hamming") <= max_hamming)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("hamming").alias("hamming"))
    )


def _simhash128_mih_pairs(
    agg: DataFrame,
    max_hamming: int,
    n_docs: int | None = None,
    max_compares: float | None = None,
) -> DataFrame:
    """4×32-bit-band MIH pair stage for 128-bit signatures — the
    geometry whose band-collision term is 2^16× smaller than the
    64-bit family's (the round-13 sixth-decade remedy). Mechanics are
    the ``_simhash_mih_pairs`` transport ported to two popcount lanes:
    band k IS the packed half sh_k, the set-bit rule emits one variant
    orientation per SET top bit, tasks own contiguous 2^(32-s) bucket
    slices, and verification is the full 128-bit popcount over the
    four halves. Any s in [1, 31] is value-exact.

    Concentration refusal (round 14, per driver advice): wide bands fix
    the AVERAGE-occupancy term (Θ(n²/2^32) per band, sub-dominant to
    ~4e10 docs), but a mass-duplicated signature value of c docs still
    plans c²/2 within-bucket compares regardless of band width — the
    exact pathology ``MIH_MAX_COMPARES`` refuses in the 16-bit twins.
    A dense 2^32 histogram is unbuildable, so the probe aggregates the
    EXACT within-bucket triangle term Σ_buckets c(c−1)/2 per band
    server-side (groupBy (band, value) → per-band SUM; the collect is
    ≤ b rows, never the value domain) and refuses above the budget.
    This is a certified LOWER bound on planned compares — it omits the
    distance-1 neighbor products, which need a paired mass value at
    v^bit — so refusal fires only on plans that certainly exceed the
    budget; the diffuse remainder is the sub-dominant average term."""
    import numpy as np
    import pandas as pd

    b, w = 4, 32
    r = max_hamming // b
    s = min(4, w - 1)
    if n_docs:
        while s < min(w - 1, 16) and n_docs * (2 + s) * b > 1_000_000 * b * (
            1 << s
        ):
            s += 1
    low = w - s
    sigs = agg.select(
        "doc_id",
        _swar_half(0, "sh_0"),
        _swar_half(32, "sh_1"),
        _swar_half(64, "sh_2"),
        _swar_half(96, "sh_3"),
    ).repartition("doc_id")
    budget = MIH_MAX_COMPARES if max_compares is None else max_compares
    if n_docs and n_docs >= MIH_PROBE_MIN_DOCS:
        vals = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"), F.col(f"sh_{k}").alias("v")
                    )
                    for k in range(b)
                ]
            )
        ).alias("bk")
        tri = (
            sigs.select(vals)
            .select(F.col("bk.band").alias("band"), F.col("bk.v").alias("v"))
            .groupBy("band", "v")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .groupBy("band")
            .agg(
                F.sum(
                    F.col("c").cast("double")
                    * (F.col("c") - 1).cast("double")
                    / 2.0
                ).alias("tri")
            )
            .collect()
        )
        planned = sum(float(row["tri"] or 0.0) for row in tri)
        if planned > budget:
            raise ValueError(
                f"simhash128 MIH planned within-bucket compare volume "
                f"{planned:.2e} exceeds max_compares={budget:.0e} at the "
                f"{b}×{w}-bit band geometry: the corpus concentrates "
                f"mass-duplicated signature values (c docs in one bucket "
                f"plan c²/2 compares at ANY band width). Exact-dedup "
                f"identical fingerprints first (exact_dedup collapses "
                f"them to one representative), shard the corpus, or "
                f"raise max_compares after sizing the cluster."
            )
    structs = []
    for k in range(b):
        bv = f"sh_{k}"
        structs.append(
            f"struct({k} AS band, cast({bv} * 2 as bigint) AS bvk)"
        )
        if r >= 1:
            structs.extend(
                f"if((shiftrightunsigned({bv}, {i}) & 1) = 1,"
                f" struct({k} AS band,"
                f" cast(({bv} ^ {1 << i}) * 2 + 1 as bigint) AS bvk),"
                " null)"
                for i in range(low, w)
            )
    ex = sigs.select(
        "doc_id",
        "sh_0",
        "sh_1",
        "sh_2",
        "sh_3",
        F.explode(
            F.expr(
                "filter(array(" + ",".join(structs) + "),"
                " x -> x is not null)"
            )
        ).alias("bk"),
    ).select(
        "doc_id", "sh_0", "sh_1", "sh_2", "sh_3", "bk.band", "bk.bvk"
    )

    _EMPTY = {
        "doc_a": pd.Series(dtype="int64"),
        "doc_b": pd.Series(dtype="int64"),
        "hamming": pd.Series(dtype="int64"),
    }
    in_task_bits = low if r >= 1 else 0

    def _mih_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        bvk = pdf["bvk"].to_numpy()
        order = np.argsort(bvk, kind="stable")
        bvk = bvk[order]
        vals = bvk >> 1
        ids = pdf["doc_id"].to_numpy()[order]
        halves = [
            pdf[f"sh_{i}"].to_numpy()[order].astype(np.uint64)
            for i in range(4)
        ]
        uvals, starts = np.unique(vals, return_index=True)
        bounds = np.append(starts, len(vals))
        n_exact = np.searchsorted(bvk, uvals * 2 + 1, side="left") - starts
        idx = {int(v): i for i, v in enumerate(uvals)}
        outs = [pd.DataFrame(_EMPTY)]

        def ham_block(r0, r1, c0, c1):
            h = _np_pop64(halves[0][r0:r1, None] ^ halves[0][None, c0:c1])
            for q in range(1, 4):
                h = h + _np_pop64(
                    halves[q][r0:r1, None] ^ halves[q][None, c0:c1]
                )
            return h.astype(np.int64)

        def emit(ham, mask_m, ids_r, ids_c):
            rr, cc = np.nonzero(mask_m)
            if len(rr):
                a = ids_r[rr]
                bb = ids_c[cc]
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_a": np.minimum(a, bb),
                            "doc_b": np.maximum(a, bb),
                            "hamming": ham[rr, cc],
                        }
                    )
                )

        for i in range(len(uvals)):
            s0, s1 = bounds[i], bounds[i + 1]
            n_e = int(n_exact[i])
            if n_e == 0:
                continue
            if s1 - s0 >= 2:
                cols = np.arange(s1 - s0)[None, :]
                for c0 in range(0, n_e, 4096):
                    c1 = min(c0 + 4096, n_e)
                    ham = ham_block(s0 + c0, s0 + c1, s0, s1)
                    rows = np.arange(c0, c1)[:, None]
                    m = (
                        ((cols < n_e) & (rows < cols)) | (cols >= n_e)
                    ) & (ham <= max_hamming)
                    emit(ham, m, ids[s0 + c0 : s0 + c1], ids[s0:s1])
            v = int(uvals[i])
            for t in range(in_task_bits):
                u = v ^ (1 << t)
                if u < v:
                    continue
                j = idx.get(u)
                if j is None:
                    continue
                t0 = bounds[j]
                n_e2 = int(n_exact[j])
                if n_e2 == 0:
                    continue
                for c0 in range(0, n_e, 4096):
                    c1 = min(c0 + 4096, n_e)
                    ham = ham_block(s0 + c0, s0 + c1, t0, t0 + n_e2)
                    m = ham <= max_hamming
                    emit(
                        ham, m, ids[s0 + c0 : s0 + c1], ids[t0 : t0 + n_e2]
                    )
        return pd.concat(outs, ignore_index=True)

    coarse = ex.withColumn(
        "__sub", F.expr(f"shiftrightunsigned(bvk, {low + 1})")
    )
    return (
        coarse.groupBy("band", "__sub")
        .applyInPandas(
            _mih_kernel, "doc_a long, doc_b long, hamming long"
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("hamming").alias("hamming"))
    )


def _island_spans(ps: str, k: int) -> Column:
    """Merge a SORTED per-document duplicated-position array ``ps`` into
    maximal strict-overlap islands, in-row — array<struct<span_start,
    span_end, n_grams>> (all bigint), ascending and disjoint by
    construction.

    Round 15 (guide §1.2 per-task work / §2.4 remove passes): the
    gaps-and-islands merge previously ran as TWO running-frame windows
    plus a (doc_id, island) aggregate under the doc_id exchange — a
    per-partition sort and three operator passes over the position
    stream. Because positions are per-document and document-length-
    bounded (the same bound the rebuild's collect_list already relies
    on), ONE sorted per-doc list + this O(n + islands) expression
    computes the identical spans: with ``ps`` ascending and constant
    gram length k, the running max(pos + k) over preceding rows is just
    ps[i-1] + k, so an island breaks exactly where ps[i] >= ps[i-1] + k.
    ``ps`` must be non-empty (guaranteed: it comes from a groupBy over
    the hit stream, so every doc_id present has >= 1 position).

    The array(bs) wrapper binds the break-index list to ONE lambda
    variable so it is evaluated once per row (the module's two-level
    transform convention)."""
    bs = (
        f"filter(sequence(0, size({ps}) - 1), "
        f"i -> i = 0 OR {ps}[i] >= {ps}[i-1] + {k})"
    )
    return F.expr(
        f"flatten(transform(array({bs}), bs -> "
        f"transform(bs, (b, t) -> struct("
        f"cast({ps}[b] as bigint) AS span_start, "
        f"cast({ps}[if(t + 1 < size(bs), bs[t + 1], size({ps})) - 1] "
        f"+ {k} as bigint) AS span_end, "
        f"cast(if(t + 1 < size(bs), bs[t + 1], size({ps})) - b "
        f"as bigint) AS n_grams))))"
    )


def _cut_spans(base: DataFrame, sp: DataFrame) -> DataFrame:
    """Shared rebuild of the substring-dedup appliers: cut every token
    covered by a span out of ``base``'s token arrays. ``sp`` is
    (doc_id, __ss) with __ss SORTED and DISJOINT (the _island_spans
    contract).

    Round 15 (guide §1.2): the kept tokens are the concatenation of the
    gap segments BETWEEN the spans, so one slice() per gap rebuilds the
    document in O(tokens + spans) — the previous per-token
    covered-by-any-span filter lambda was O(tokens × spans) per
    document."""
    empty = (
        "cast(array() as array<struct<"
        "span_start:bigint,span_end:bigint,n_grams:bigint>>)"
    )
    gap_start = "if(g = 0, 0L, ss[g - 1].span_end)"
    gap_end = (
        "if(g < size(ss), ss[g].span_start, cast(size(__toks) as bigint))"
    )
    kept = F.expr(
        f"flatten(transform(array(coalesce(__ss, {empty})), ss -> "
        f"flatten(transform(sequence(0, size(ss)), g -> "
        f"slice(__toks, cast({gap_start} as int) + 1, "
        f"cast({gap_end} - {gap_start} as int))))))"
    )
    return (
        base.join(sp, "doc_id", "left")
        .select("doc_id", "__toks", kept.alias("__kept"))
        .select(
            "doc_id",
            F.array_join("__kept", " ").alias("clean_text"),
            (F.size("__toks") - F.size("__kept"))
            .cast("bigint")
            .alias("n_tokens_removed"),
        )
    )


def substring_dedup_spans(
    df: DataFrame, text_col: str = "text", min_tokens: int = 8
) -> DataFrame:
    """Duplicate-substring span mining — the distributed form of
    exact-substring training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499,
    which builds a corpus-wide suffix array; no reference-repo
    counterpart — capability extension per SURVEY.md §2.11).

    A position p of a document is DUPLICATED if the ``min_tokens``-token
    shingle starting at p occurs at least twice in the corpus (other
    document or elsewhere in the same one). Output: one row per maximal
    run of overlapping duplicated shingles — (doc_id, span_start,
    span_end) in token offsets, [start, end), plus span length and the
    number of duplicated shingles merged into the run. Downstream
    curation cuts or drops these spans.

    SCALE DESIGN — a suffix array across a cluster is not buildable;
    shingle-position mining gives the same "every duplicated run of ≥
    min_tokens tokens is found" guarantee (a duplicated run of length L
    contains L-min_tokens+1 duplicated shingles, and any shared
    min_tokens-gram IS a duplicated run) with only: one position
    explode (shuffle-free), a PARTIAL-AGG duplicated-digest rollup
    (``groupBy(gh).count() ≥ 2`` — map-side combine collapses a
    mass-duplicated shingle to one row per map task before the
    exchange) LEFT-SEMI-joined back onto the position stream
    (shuffle-hash on the fixed-width 128-bit hash-pair key, so AQE skew-split divides
    a hot probe partition across tasks), and ONE key-partitioned
    exchange on doc_id under which both the gaps-and-islands run merge
    (two windows, same partitioning) and the final per-run aggregate
    execute — the aggregate's (doc_id, island) grouping is co-located
    by the doc_id exchange, so it adds no shuffle. Round 14 de-skew:
    the previous corpus-frequency COUNT window partitioned by the raw
    position stream serialized ALL occurrences of a 10⁸-copy
    boilerplate shingle — precisely the data this operator exists to
    find — into ONE WindowExec task (windows are never
    AQE-skew-splittable); the rollup+semi-join keeps every task bounded
    at the cost of a second gh-only-pruned pass over the explode. The
    frequency filter keeps only duplicated positions, so the doc_id
    exchange moves a small fraction of the corpus. Spans merge on
    strict overlap (pos < previous span end): two adjacent but
    non-overlapping duplicated shingles are separate runs — their
    concatenation was never itself observed twice.

    Round 15 (guide §1.2/§2.4): the gaps-and-islands merge moved from
    two running-frame windows + a (doc_id, island) aggregate to one
    per-doc sorted position list + the in-row ``_island_spans``
    expression — the doc_id exchange now feeds a single aggregate and
    the per-partition window sort disappears (plan diff in
    plans/r15/substring_dedup_{before,after}.txt).
    """
    return (
        _dup_span_lists(df, text_col, min_tokens)
        .select("doc_id", F.explode("__ss").alias("s"))
        .select(
            "doc_id",
            "s.span_start",
            "s.span_end",
            (F.col("s.span_end") - F.col("s.span_start")).alias(
                "span_tokens"
            ),
            "s.n_grams",
        )
    )


def _dup_span_lists(
    df: DataFrame, text_col: str, min_tokens: int
) -> DataFrame:
    """Shared mining core of the substring-dedup family: per document,
    the SORTED, DISJOINT list of maximal duplicated-run spans —
    (doc_id, __ss: array<struct<span_start, span_end, n_grams>>), one
    row per document that has at least one duplicated position. See
    ``substring_dedup_spans`` for the scale design of the position
    explode + duplicated-digest rollup + semi-join; ``_island_spans``
    for the in-row run merge."""
    k = min_tokens
    toks = F.col("__toks")
    # Build the gram strings once (array<string>), then key each with the
    # 128-bit xxhash pair (round 14: was md5-hex — ~0.19 s/pass dearer at
    # sf0.1 and 3x the exchange-key width; see content_key128). The
    # two-level transform binds the gram string to ONE lambda variable so
    # both hash lanes read a single evaluation of the concat.
    gram_strs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(k)),
        lambda i: F.concat_ws(" ", *[toks[i + F.lit(j)] for j in range(k)]),
    )
    grams = F.transform(
        gram_strs,
        lambda g, i: F.struct(
            i.alias("pos"),
            *(
                c.alias(n)
                for c, n in zip(content_key128(g), ("g1", "g2"))
            ),
        ),
    )
    safe = F.when(F.size(toks) >= k, grams).otherwise(
        F.array().cast("array<struct<pos:int,g1:bigint,g2:bigint>>")
    )
    pos = (
        spread(df)
        .select("doc_id", tokens(F.col(text_col)).alias("__toks"))
        .select("doc_id", F.explode(safe).alias("g"))
        .select("doc_id", "g.pos", "g.g1", "g.g2")
    )
    dup = (
        pos.groupBy("g1", "g2")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
        .select("g1", "g2")
    )
    hits = pos.join(
        dup.hint("shuffle_hash"), ["g1", "g2"], "left_semi"
    ).select("doc_id", "pos")
    return (
        hits.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
        .select("doc_id", _island_spans("__ps", k).alias("__ss"))
    )


def substring_dedup_apply(
    df: DataFrame, text_col: str = "text", min_tokens: int = 8
) -> DataFrame:
    """Apply duplicate-substring dedup: cut every token covered by a
    ``substring_dedup_spans`` run out of the text, returning (doc_id,
    clean_text, n_tokens_removed) — the curation half of exact-substring
    dedup (the mining half documents the spans; this one edits the
    corpus).

    Policy: ALL occurrences of a duplicated run are removed (the
    conservative variant — keeping one canonical copy requires a global
    per-cluster election, which is a separate keeper-selection pass à la
    ``dedup_keep_best``). Deterministic, so the DuckDB oracle replays it
    bit-for-bit.

    Scale shape: the span-list table (small — documents with duplicated
    positions only) hash-joins back onto the corpus on doc_id; the token
    cut slices the gap segments between the sorted spans (``_cut_spans``,
    round 15 — O(n_tokens + n_spans) per row vs the previous per-token
    covered-by-any-span filter's O(n_tokens × n_spans)), with no
    additional shuffle. A left join keeps span-free documents untouched.
    Round 15: the span lists come straight from ``_dup_span_lists`` —
    the explode-to-rows + re-collect round trip the old
    ``substring_dedup_spans`` + groupBy composition paid is gone.
    """
    sp = _dup_span_lists(df, text_col, min_tokens)
    base = df.select("doc_id", tokens(F.col(text_col)).alias("__toks"))
    return _cut_spans(base, sp)


def substring_dedup_keep_first(
    df: DataFrame, text_col: str = "text", min_tokens: int = 8
) -> DataFrame:
    """Keep-one exact-substring dedup: like ``substring_dedup_apply`` but
    each duplicated ``min_tokens``-token shingle KEEPS its globally first
    occurrence (smallest (doc_id, position)) and only the redundant
    occurrences are cut — the all-but-one removal policy of
    exact-substring training-data dedup, losing no content entirely.

    The keeper election packs (doc_id, pos) into one orderable BIGINT
    (``LINE_STRIDE`` packing, the line_dedup convention — lexicographic
    (doc_id, pos) order IS packed-key order inside the guarded
    envelope) and takes MIN per shingle digest in the same PARTIAL-AGG
    rollup that carries the corpus-frequency count — deterministic,
    retry-stable, and map-side combinable, so a mass-duplicated shingle
    collapses to one (digest, count, min) row per map task before the
    exchange. The rollup joins back onto the position stream
    (shuffle-hash on the fixed-width hash-pair key, AQE-skew-splittable); positions that
    are not the elected minimum of a ≥2×-occurring shingle are
    redundant. Round 14 de-skew: the previous COUNT + ROW_NUMBER
    windows over the raw position stream serialized every occurrence of
    a boilerplate shingle into one WindowExec task (windows are never
    AQE-skew-splittable). Redundant positions merge into strict-overlap
    islands and are cut exactly as in ``substring_dedup_apply``. A
    token inside a KEPT occurrence survives unless some other redundant
    occurrence also covers it.
    """
    k = min_tokens
    toks = F.col("__toks")
    # Same 128-bit xxhash-pair gram key as substring_dedup_spans (round
    # 14: was md5-hex; see content_key128 for the cost/collision math).
    gram_strs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(k)),
        lambda i: F.concat_ws(" ", *[toks[i + F.lit(j)] for j in range(k)]),
    )
    grams = F.transform(
        gram_strs,
        lambda g, i: F.struct(
            i.alias("pos"),
            *(
                c.alias(n)
                for c, n in zip(content_key128(g), ("g1", "g2"))
            ),
        ),
    )
    safe = F.when(F.size(toks) >= k, grams).otherwise(
        F.array().cast("array<struct<pos:int,g1:bigint,g2:bigint>>")
    )
    base = df.select("doc_id", tokens(F.col(text_col)).alias("__toks"))
    pos = (
        # cost=2: the k-token gram build + hash per position row is the
        # heaviest per-byte projection in the substring family (round-14
        # width sweep: keep_first median 1.05 s @128 KB/task → 0.84 s at
        # the 2× width at sf0.1).
        spread(base, cost=2)
        .select("doc_id", "__toks", F.explode(safe).alias("g"))
        .select("doc_id", "g.pos", "g.g1", "g.g2")
    )
    max_doc = (1 << 63) // LINE_STRIDE - 1
    pk = F.expr(
        f"if(assert_true(doc_id >= 0 AND doc_id <= {max_doc} "
        f"AND pos < {LINE_STRIDE}, "
        f"'substring_dedup_keep_first key packing needs 0 <= doc_id <= "
        f"{max_doc} and < {LINE_STRIDE} token positions per document; "
        f"chunk or re-key first') is null, "
        f"cast(doc_id * {LINE_STRIDE}L + pos as bigint), null)"
    )
    stats = (
        pos.groupBy("g1", "g2")
        .agg(F.count(F.lit(1)).alias("__c"), F.min(pk).alias("__mk"))
        .where(F.col("__c") >= 2)
    )
    redundant = (
        pos.join(stats.hint("shuffle_hash"), ["g1", "g2"])
        .where(pk != F.col("__mk"))
        .select("doc_id", "pos")
    )
    # Round 15: same in-row islands merge + gap-slice rebuild as the
    # spans/apply pair (guide §1.2/§2.4 — the two running-frame windows,
    # their per-partition sort, and the (doc_id, island) aggregate are
    # replaced by one per-doc sorted list + _island_spans; the rebuild
    # goes O(tokens × spans) → O(tokens + spans) via _cut_spans).
    sp = (
        redundant.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
        .select("doc_id", _island_spans("__ps", k).alias("__ss"))
    )
    return _cut_spans(base, sp)


# Positions-per-document bound for packing (doc_id, pos) into one orderable
# BIGINT key: supports documents up to 1e9 lines and doc_ids up to ~9.2e9.
LINE_STRIDE = 1_000_000_000


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    delim: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide duplicate-line removal, keep-first — the C4/CCNet line
    dedup policy (Raffel et al. 2020 dedup "three-sentence spans"; Dolma /
    CCNet apply it at line granularity): every distinct line keeps only its
    globally first occurrence (smallest (doc_id, position)); later
    occurrences — boilerplate headers, nav bars, cookie banners — are cut
    from their documents. Lines shorter than ``min_chars`` (e.g. blank
    separator lines) carry structure, not content, and are always kept.

    Returns (doc_id, clean_text, n_lines_removed) for EVERY input document
    (a fully-deduplicated document comes back with ``clean_text = ''``).

    ``delim`` must be a plain literal with no regex metacharacters (it is
    passed to ``split``'s pattern position).

    Scale shape: posexplode lines; the global keep-first election packs
    (doc_id, pos) into one orderable BIGINT and takes MIN per distinct
    line as a PARTIAL-AGG rollup keyed by the line's 128-bit hash-pair digest
    (fixed-width uniform exchange key; map-side combine collapses a
    mass-duplicated line to one row per map task before any exchange),
    left-joined back onto the line stream (shuffle-hash, so AQE
    skew-split divides a hot probe partition across tasks); then one
    hash exchange on doc_id rebuilds documents with an array_sort over
    the per-doc line list (document-length-bounded). Round 14 de-skew:
    the previous MIN window PARTITIONED BY the raw line string put a
    10⁸-copy cookie-banner line — the exact data this operator exists
    to remove — into ONE WindowExec task with the line text riding
    every row (windows are never AQE-skew-splittable, and the exchange
    key itself was the unbounded string); the rollup+join shape keeps
    every task bounded and exchanges the text only under a
    skew-splittable join. No driver state.
    """
    lines = spread(df).select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), delim, -1)).alias("pos", "line"),
    )
    elig = F.length("line") >= min_chars
    # The packed election key is only injective while 0 <= pos <
    # LINE_STRIDE and 0 <= doc_id <= MAX_LONG div LINE_STRIDE (the
    # multiply wraps SILENTLY under the session's non-ANSI mode);
    # outside that envelope it would mis-elect keep-first winners, so
    # enforce all three bounds at runtime (same assert_true-routing
    # trick as simhash's _swar_half — the if() keeps the guard from
    # being pruned as unused).
    max_doc = (1 << 63) // LINE_STRIDE - 1
    key = F.expr(
        f"if(assert_true(doc_id >= 0 AND doc_id <= {max_doc} "
        f"AND pos < {LINE_STRIDE}, "
        f"'line_dedup key packing needs 0 <= doc_id <= {max_doc} "
        f"and < {LINE_STRIDE} lines per document; chunk or re-key "
        f"first') is null, "
        f"cast(doc_id * {LINE_STRIDE}L + pos as bigint), null)"
    )
    # 128-bit xxhash-pair line digest (round 14: was md5-hex — dearer to
    # compute and 3x the exchange-key width; see content_key128)
    h1, h2 = content_key128(F.col("line"))
    elect = (
        lines.where(elig)
        .select(h1.alias("__h1"), h2.alias("__h2"), key.alias("__k"))
        .groupBy("__h1", "__h2")
        .agg(F.min("__k").alias("__mk"))
    )
    kept = ~elig | (key == F.col("__mk"))
    rows = (
        lines.withColumn("__h1", h1)
        .withColumn("__h2", h2)
        .join(elect.hint("shuffle_hash"), ["__h1", "__h2"], "left")
        .select(
            "doc_id",
            "pos",
            # Round 15 (guide §2.3, shuffle fewer bytes): a REMOVED
            # line's text never reaches the output — only its count
            # does — so null it out before the doc_id rebuild exchange.
            # At corpus scale the mass-duplicated lines this operator
            # exists to remove are exactly the rows that no longer ship
            # their text.
            F.when(kept, F.col("line")).alias("line"),
            kept.alias("__kept"),
        )
    )
    agg = rows.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "__kept", "line"))).alias(
            "ls"
        )
    )
    clean = F.array_join(
        F.expr("transform(filter(ls, s -> s.__kept), s -> s.line)"), delim
    )
    removed = F.size("ls") - F.expr("size(filter(ls, s -> s.__kept))")
    return agg.select(
        "doc_id",
        clean.alias("clean_text"),
        removed.cast("bigint").alias("n_lines_removed"),
    )


def incremental_line_dedup(
    new_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    delim: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Incremental C4/CCNet line dedup: strip from each NEW document every
    line already present in the ingested corpus, plus batch-internal
    duplicates (keep-first within the batch) — completing the incremental
    family (``incremental_dedup`` for exact docs, ``incremental_near_dup``
    for near-dups, this for lines). Returns (doc_id, clean_text,
    n_lines_removed) for every new document.

    Scale shape: the history side collapses to DISTINCT line digests
    (xxhash64 pair — 16 bytes per distinct line; in a real deployment this digest
    index is a maintained table appended once per batch, so the daily
    cost reads the NEW batch only, exactly like ``incremental_dedup``'s
    digest set). New-batch lines are posexploded; the batch-internal
    keep-first election reuses ``line_dedup``'s round-14 de-skewed
    shape — packed-BIGINT MIN as a PARTIAL-AGG rollup keyed by the line's
    hash-pair digest (map-side combine collapses a mass-duplicated line before
    the exchange), joined back shuffle-hash so AQE skew-split bounds
    the hot-key tasks (the previous MIN window partitioned by the raw
    line string serialized them into one task); history membership is
    ONE digest equi-join on the SAME hash-pair key, so the two joins
    share the probe-side partitioning — uniform fixed-width keys,
    broadcastable while the index is small and hash-partitioned beyond
    that.
    """
    # 128-bit xxhash-pair line digest for the history index and the
    # batch election (round 14: was md5-hex; see content_key128)
    lh1, lh2 = content_key128(F.col("line"))
    hist = (
        spread(history_df)
        .select(
            F.explode(F.split(F.col(text_col), delim, -1)).alias("line")
        )
        .where(F.length("line") >= min_chars)
        .select(lh1.alias("__hl1"), lh2.alias("__hl2"))
        .distinct()
    )
    lines = spread(new_df).select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), delim, -1)).alias(
            "pos", "line"
        ),
    )
    elig = F.length("line") >= min_chars
    max_doc = (1 << 63) // LINE_STRIDE - 1
    key = F.expr(
        f"if(assert_true(doc_id >= 0 AND doc_id <= {max_doc} "
        f"AND pos < {LINE_STRIDE}, "
        f"'incremental_line_dedup key packing needs 0 <= doc_id <= "
        f"{max_doc} and < {LINE_STRIDE} lines per document; chunk or "
        f"re-key first') is null, "
        f"cast(doc_id * {LINE_STRIDE}L + pos as bigint), null)"
    )
    elect = (
        lines.where(elig)
        .select(lh1.alias("__hl1"), lh2.alias("__hl2"), key.alias("__k"))
        .groupBy("__hl1", "__hl2")
        .agg(F.min("__k").alias("__mk"))
    )
    flagged = (
        lines.select(
            "doc_id",
            "pos",
            "line",
            elig.alias("__elig"),
            key.alias("__k"),
            lh1.alias("__hl1"),
            lh2.alias("__hl2"),
        )
        .join(elect.hint("shuffle_hash"), ["__hl1", "__hl2"], "left")
        .join(
            hist.withColumn("__dup", F.lit(True)),
            ["__hl1", "__hl2"],
            "left",
        )
        .select(
            "doc_id",
            "pos",
            # removed lines ship no text into the rebuild exchange —
            # see line_dedup (round 15, guide §2.3)
            F.when(
                ~F.col("__elig")
                | (
                    (F.col("__k") == F.col("__mk"))
                    & F.col("__dup").isNull()
                ),
                F.col("line"),
            ).alias("line"),
            (
                ~F.col("__elig")
                | (
                    (F.col("__k") == F.col("__mk"))
                    & F.col("__dup").isNull()
                )
            ).alias("__kept"),
        )
    )
    agg = flagged.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "__kept", "line"))).alias(
            "ls"
        )
    )
    clean = F.array_join(
        F.expr("transform(filter(ls, s -> s.__kept), s -> s.line)"), delim
    )
    removed = F.size("ls") - F.expr("size(filter(ls, s -> s.__kept))")
    return agg.select(
        "doc_id",
        clean.alias("clean_text"),
        removed.cast("bigint").alias("n_lines_removed"),
    )


def source_dup_stats(
    df: DataFrame, text_col: str = "text", key_col: str = "source"
) -> DataFrame:
    """Per-source duplication diagnostics: within-source duplicate rate and
    cross-source leakage (docs whose exact text also appears under a
    DIFFERENT source) — the domain-level dup-rate report a crawl-curation
    pipeline runs before mixing sources.

    Scale shape: digest texts (md5, never the raw string on the wire),
    one partial-agg rollup to (source, digest, cnt), a COUNT DISTINCT
    window on the digest key for the cross-source fan-out (digest
    partitions are duplicate-frequency-bounded), then one rollup to the
    source grain — which is tiny by definition. No joins.
    """
    h = F.md5(F.col(text_col))
    per = (
        spread(df)
        .select(F.col(key_col).alias("source"), h.alias("hh"))
        .groupBy("source", "hh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_src = F.size(F.collect_set("source").over(Window.partitionBy("hh")))
    wide = per.withColumn("n_sources", n_src)
    out = wide.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("cnt") - F.count(F.lit(1))).alias("dup_docs"),
        F.sum(F.when(F.col("n_sources") >= 2, F.col("cnt")).otherwise(0)).alias(
            "cross_source_docs"
        ),
    )
    ratio = F.col("dup_docs").cast("double") / F.col("n_docs").cast("double")
    return out.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.col("dup_docs").cast("bigint").alias("dup_docs"),
        quantize(ratio, 6).alias("dup_ratio"),
        F.col("cross_source_docs").cast("bigint").alias("cross_source_docs"),
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    head_tokens: int = 8,
) -> DataFrame:
    """Cross-source duplication matrix: for every unordered source pair
    (src_a < src_b), the number of distinct head-shingle fingerprints
    present in BOTH — the mirror/template diagnostic a multi-source
    curation pipeline reads before deciding which source to keep. Exact
    whole-document digests rarely cross sources (mirrors edit footers);
    the md5 of the first ``head_tokens`` tokens is the standard cheap
    head fingerprint.

    Scale shape: one scan → distinct (fingerprint, source) — a map-side-
    combined hash agg — → groupBy fingerprint with an in-row ordered
    pair expansion over the per-fingerprint source SET (bounded by the
    source count, never the corpus) → one final tiny aggregate. No
    self-join: the join-free pair generation is the minhash bucket
    pattern, and the output is #sources² rows at most.
    """
    key = F.md5(
        F.concat_ws(
            " ", F.slice(F.split(F.col(text_col), " "), 1, head_tokens)
        )
    )
    d = df.select(
        key.alias("k"), F.col(source_col).alias("src")
    ).distinct()
    sets = (
        d.groupBy("k")
        .agg(F.array_sort(F.collect_set("src")).alias("ss"))
        .where(F.size("ss") >= 2)
    )
    pairs = F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), "
        "y -> struct(x AS src_a, y AS src_b))))"
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy("p.src_a", "p.src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


def incremental_near_dup(
    new: DataFrame,
    hist: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """NEAR-dup screening of a new batch against the HISTORY corpus — the
    per-batch form of ``minhash_near_dup_pairs``, and the near-dup
    upgrade of ``incremental_dedup`` (which catches exact text only): a
    new document is flagged when it shares an LSH band bucket with a
    history document and the signature-estimated Jaccard clears the
    threshold.

    Returns the DROP LIST (doc_id, dup_of, est_jaccard): ``dup_of`` is
    the lowest-id qualifying history doc (deterministic keeper rule,
    matching ``semantic_dedup``), ``est_jaccard`` its estimate. New docs
    absent from the list are clean and enter the corpus.

    Scale shape: this is the INDEX-JOIN form of incremental curation —
    the history side is exactly the (band, band_key) table a production
    pipeline would persist as its dedup index (append-only, one row per
    doc per band), so screening batch B costs one signature pass over B
    plus an equi-join against the index — never a rescan of the history
    corpus text. Hot history buckets above ``bucket_cap`` are mass-dup
    clusters (est ≈ 1 for every member, no ranking signal) and are
    dropped, mirroring the in-corpus pair miner; the oracle applies the
    identical cap. Candidates meet ONLY on full-band agreement — no
    all-pairs term anywhere.
    """
    nb = lsh_bands(minhash_signatures(new, text_col)).select(
        F.col("doc_id").alias("new_id"),
        F.col("sig").alias("nsig"),
        "band",
        "band_key",
    )
    hb = lsh_bands(minhash_signatures(hist, text_col)).select(
        F.col("doc_id").alias("hist_id"),
        F.col("sig").alias("hsig"),
        "band",
        "band_key",
    )
    wcnt = F.count(F.lit(1)).over(Window.partitionBy("band", "band_key"))
    hb = hb.withColumn("__c", wcnt).where(F.col("__c") <= bucket_cap).drop(
        "__c"
    )
    eq = F.expr("size(filter(zip_with(nsig, hsig, (u, v) -> u = v), t -> t))")
    est = eq.cast("double") / F.lit(float(N_HASHES))
    pairs = (
        nb.join(hb, ["band", "band_key"])
        .select("new_id", "hist_id", est.alias("est_jaccard"))
        .groupBy("new_id", "hist_id")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )
    return (
        pairs.groupBy("new_id")
        .agg(
            F.min("hist_id").alias("dup_of"),
            F.expr("min_by(est_jaccard, hist_id)").alias("est_jaccard"),
        )
        .select(F.col("new_id").alias("doc_id"), "dup_of", "est_jaccard")
    )


# Distinct-name occupancy cap per blocking word for fuzzy_pairs: a word
# shared by more distinct values than this is stopword-class and blocks
# nothing (the minhash BUCKET_CAP precedent, at the value grain).
FUZZY_WORD_CAP = 1000


def fuzzy_pairs(
    df: DataFrame,
    name_col: str = "p_name",
    max_dist: int = 2,
    word_cap: int = FUZZY_WORD_CAP,
) -> DataFrame:
    """Edit-distance near-duplicate VALUE pairs — the entity-resolution
    shape ("cold gear" vs "old gear" are probably the same part, affecting
    cnt_a + cnt_b rows). Dedup runs at the DISTINCT-value grain, and the
    candidate contract is word-blocked (pairs must share ≥ 1 word token,
    the declared-blocking convention the LSH family uses): within each
    word's distinct-value list, unordered pairs generate in-row, dedupe
    across shared words, and survive at ``levenshtein ≤ max_dist``.

    Scale shape: the quadratic term is confined to distinct-values-per-
    word, which is VOCABULARY-bounded, never corpus-bounded (the
    vocab_topk argument), and words above ``word_cap`` distinct values are
    stopword-class — they block nothing and are dropped, loudly bounded
    like the minhash hot-bucket cap. Two exchanges (word rollup, pair
    distinct), no joins; ``levenshtein`` is JVM-native codegen on both
    engines with identical unit-cost semantics, so the oracle replays
    byte-for-byte. Mirrors the reference's normalization concern
    (``elt/clean_sheets.py`` lowercases/strips free-text columns before
    grouping) taken to the matching step it never had.
    """
    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    words = names.select(
        "name",
        "cnt",
        F.explode(F.array_distinct(F.split("name", " ", -1))).alias("w"),
    ).where(F.length("w") > 0)
    wcnt = F.count(F.lit(1)).over(Window.partitionBy("w"))
    ok = words.withColumn("__n", wcnt).where(F.col("__n") <= word_cap)
    lists = (
        ok.groupBy("w")
        .agg(
            F.array_sort(F.collect_list(F.struct("name", "cnt"))).alias("ns")
        )
        .where(F.size("ns") >= 2)
    )
    combos = F.expr(
        "flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns)), y -> "
        "struct(x.name AS name_a, x.cnt AS cnt_a, "
        "y.name AS name_b, y.cnt AS cnt_b))))"
    )
    pairs = (
        lists.select(F.explode(combos).alias("p"))
        .select("p.name_a", "p.cnt_a", "p.name_b", "p.cnt_b")
        .distinct()
    )
    d = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return pairs.where(d <= max_dist).select(
        "name_a",
        "name_b",
        d.cast("bigint").alias("dist"),
        "cnt_a",
        "cnt_b",
    )
