"""Aggregation operators A1-A11 (SURVEY.md §2.4) + deterministic numerics.

Covers the reference's global max/min/sum/count/avg
(``/root/reference/elt/prescriptive/prescriptive_logic.py:78,109,133``),
the dashboard's conditional percentage, grouped counts, time-bucketed
averages and distinct counts
(``docker/metabase_backup_utf8.sql:11113,11126,11116,11097``).

Deterministic-numerics policy (oracle parity AND reproducibility at scale):
floating-point addition is not associative, so a double SUM over a shuffled
dataset is run-order dependent. Any aggregate over *non-integer-valued*
doubles is routed through DECIMAL (exact, order-independent) and converted
back at the edge. Integer-valued doubles (counts, quantities) sum exactly in
binary FP and need no detour. Per-row expressions are deterministic already.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_sum(col: str | Column, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a fractional double column.

    DECIMAL partial aggregates are exact, so map-side combine + any reduce
    order give bit-identical results — required for the DuckDB oracle and
    for run-to-run reproducibility on a 1000-executor shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = f"decimal({precision},{scale})"
    return F.sum(c.cast(d)).cast("double")


def exact_avg(col: str | Column, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal SUM, double division at the edge."""
    c = F.col(col) if isinstance(col, str) else col
    d = f"decimal({precision},{scale})"
    return F.sum(c.cast(d)).cast("double") / F.count(c)


def quantize(col: Column, digits: int = 2) -> Column:
    """floor(x*10^d + 0.5)/10^d — a rounding that is bit-identical across
    engines.

    ``round()`` on doubles differs between engines on boundary values
    (Spark rounds the shortest decimal representation, DuckDB the binary
    value); floor/multiply/divide are single exact-or-correctly-rounded FP
    ops, so any engine evaluating this expression tree gets the same bits.
    """
    p = float(10**digits)
    return F.floor(col * p + F.lit(0.5)) / p


def conditional_pct(df: DataFrame, cond: Column, alias: str) -> DataFrame:
    """A5: ``ROUND(100.0*SUM(CASE WHEN cond THEN 1 ELSE 0 END)/COUNT(*),2)``
    (card 54, ``metabase_backup_utf8.sql:11113``). Integer sum and count are
    exact; one double division + quantize."""
    pct = (
        F.lit(100.0)
        * F.sum(F.when(cond, 1).otherwise(0)).cast("double")
        / F.count(F.lit(1)).cast("double")
    )
    return df.agg(quantize(pct, 2).alias(alias))


def group_count_ordered(df: DataFrame, key: str, alias: str = "total") -> DataFrame:
    """A6: frequency distribution (card 51, ``:11126``). Partial (map-side)
    count + final hash aggregate; ORDER BY on the tiny grouped result only."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias(alias))
        .orderBy(F.desc(alias), F.col(key))
    )


def time_bucket_agg(
    df: DataFrame, ts: str, unit: str, aggs: dict[str, Column]
) -> DataFrame:
    """A7: DATE_TRUNC bucketing + aggregates (cards 41/45/58,
    ``metabase_backup_utf8.sql:11116,11128,11072``).

    ``date_trunc`` is a deterministic per-row expression, so the groupBy
    hash-partitions on the bucket — at 100 TB this is ONE shuffle keyed on
    the bucket, with map-side partial aggregation shrinking it first.
    """
    bucket = F.date_trunc(unit, F.col(ts)).alias("bucket")
    return df.groupBy(bucket).agg(*[c.alias(a) for a, c in aggs.items()])


def distinct_count(df: DataFrame, col: str, alias: str, approx: bool = False) -> DataFrame:
    """A11: COUNT(DISTINCT x); ``approx=True`` switches to HyperLogLog
    (``approx_count_distinct``) — the 100 TB default, one pass, no
    distinct-shuffle."""
    agg = (
        F.approx_count_distinct(col).alias(alias)
        if approx
        else F.countDistinct(col).alias(alias)
    )
    return df.agg(agg)


def salted_group_count(
    df: DataFrame, key: str, alias: str = "total", salt_buckets: int = 8
) -> DataFrame:
    """Two-stage (salted) COUNT grouped by a potentially skewed key.

    Stage 1 groups by (key, salt) so one hot key spreads over
    ``salt_buckets`` reducers; stage 2 sums the partials. The result is
    IDENTICAL to a plain groupBy count — only the shuffle shape changes.
    The salt hashes all row columns (no ``rand()``: keeps the plan
    deterministic and retry-safe, which ``rand()`` is not under Spark task
    retries).

    At 100 TB this is the manual fallback when AQE can't help (skewed
    AGGREGATION rather than skewed join).
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("__partial").cast("bigint").alias(alias))
        .orderBy(F.desc(alias), F.col(key))
    )


def group_median(
    df: DataFrame, key: str, val: str, alias: str = "median"
) -> DataFrame:
    """Exact CONTINUOUS (interpolated) median per group.

    Element selection by row_number — for odd group sizes the median IS a
    data element (exact); for even sizes it is the mean of the two middle
    elements, computed as ``(lo + hi) / 2`` in double arithmetic: one
    addition + one division by a power of two, both correctly rounded and
    engine-independent, so cross-engine parity needs no quantization.
    Ties in ``val`` are broken by the companion row-number ordering, which
    only affects WHICH equal value is selected — not the result.

    Scale shape: one hash-partition + in-partition sort (the window),
    then a per-group filter — the same distributed sort any exact
    percentile needs. Groups are hash-partitioned independently, so skew
    is bounded by the largest single group; at 100 TB with pathological
    group sizes, route through approx_percentile instead (the
    approx_quantiles operator) — exactness is this operator's contract.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(val)
    wc = Window.partitionBy(key)
    # NULL contract: NULL values are excluded from the median (SQL
    # percentile semantics — a group of all-NULLs produces no row).
    ranked = (
        df.select(key, val)
        .where(F.col(val).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(wc))
    )
    lo_pos = (F.col("__cnt") + 1) / 2  # fractional for even counts
    picked = ranked.where(
        (F.col("__rn") == F.floor(lo_pos))
        | (F.col("__rn") == F.ceil(lo_pos))
    )
    return (
        picked.groupBy(key)
        .agg(
            (
                (F.min(val).cast("double") + F.max(val).cast("double"))
                / F.lit(2.0)
            ).alias(alias)
        )
    )


def mad_outliers(
    df: DataFrame,
    key: str,
    val: str,
    id_col: str,
    n_mads: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier detection: flag rows whose absolute
    deviation from the group median exceeds ``n_mads`` × the median
    absolute deviation (MAD) — the robust z-score every metrics pipeline
    uses where mean/stddev would be dragged by the outliers themselves.

    Every step is EXACT: both medians are discrete element selections
    (lower-middle element — no interpolation), |v - med| is one exactly-
    rounded double subtraction, and the threshold compare multiplies by a
    small constant — all deterministic IEEE ops, so the oracle matches
    bit for bit with no quantization anywhere.

    Scale shape: two windowed selections over the same (key)-partitioned
    sort, then a broadcast join of the per-group thresholds (one row per
    group — tiny) back onto the rows. Groups process independently; at
    100 TB the threshold table broadcasts and the row pass is scan-speed.
    CAVEAT (all per-group exact-selection operators share it): a window
    partition is ONE task, so with few distinct keys the sort serializes
    at #groups-way parallelism (measured: 8.7× on 10× data at 5 event
    types, SCALING.md). Exactness is this operator's contract; when the
    key cardinality is small relative to the cluster AND the corpus is
    huge, route through ``approx_quantiles`` (t-digest scales flat) and
    accept approximate thresholds.
    """
    from pyspark.sql.window import Window

    if _robust_select_applies(df):
        # rank_select refuses >RANK_SELECT_MAX_GROUPS keys (ValueError) —
        # that regime is exactly where the window plan parallelizes, so
        # fall through to it instead of surfacing an internal helper's
        # refusal to a caller who never chose the plan.
        try:
            out = _mad_outliers_select(df, key, val, id_col, n_mads)
        except ValueError:
            out = None
        if out is not None:
            return out

    # NULL contract (both plans): rows with NULL ``val`` carry no robust-
    # z-score and are excluded — SQL percentile semantics, matching
    # rank_select's ``val IS NOT NULL`` filter so the two plans stay
    # value-identical on NULL-bearing data.
    #
    # Both medians ride WINDOW functions over the one (key)-hash
    # exchange instead of groupBy+broadcast-join round trips (the
    # round-11 shape; the joins cost 4 extra jobs and ~2× wall at bench
    # scale, value-identical by construction): the discrete median is
    # the unique row_number == (cnt+1) div 2 element, so min(when(...))
    # over the key partition reproduces exactly the value the old
    # filter+groupBy picked; the second median re-sorts WITHIN the same
    # partitioning (a sort, not an exchange).
    base = df.select(id_col, key, val).where(F.col(val).isNotNull())
    wc = Window.partitionBy(key)
    w1 = Window.partitionBy(key).orderBy(val, id_col)
    mid = F.expr("(__cnt + 1) div 2")
    ranked = base.withColumn("__rn", F.row_number().over(w1)).withColumn(
        "__cnt", F.count(F.lit(1)).over(wc)
    )
    med_w = F.min(F.when(F.col("__rn") == mid, F.col(val))).over(wc)
    staged = ranked.withColumn("med", med_w).withColumn(
        "__adev", F.abs(F.col(val) - F.col("med"))
    )
    w2 = Window.partitionBy(key).orderBy("__adev", id_col)
    ranked2 = staged.withColumn("__rn2", F.row_number().over(w2))
    mad_w = F.min(
        F.when(F.col("__rn2") == mid, F.col("__adev"))
    ).over(wc)
    return (
        ranked2.withColumn("mad", mad_w)
        .where(F.col("__adev") > F.lit(float(n_mads)) * F.col("mad"))
        .select(
            id_col,
            key,
            val,
            "med",
            "mad",
        )
    )


def winsorize(
    df: DataFrame,
    key: str,
    val: str,
    id_col: str,
    lower_pct: float = 0.05,
    upper_pct: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip values to the group's discrete
    [lower_pct, upper_pct] percentile elements — outlier damping before
    averaging or model-feature export.

    Percentile selection is DISCRETE (``ceil(pct · n)``-th element, an
    actual data value — no interpolation), so the clip bounds and the
    clipped values are exact and engine-independent. Scale shape: one
    (key)-partitioned window sort to rank, a per-group filter producing
    the TWO bound rows per group, and a broadcast join back — rows never
    move except for the rank shuffle. Same low-cardinality-key caveat as
    ``mad_outliers``: exact selection serializes each group into one
    sort task; at corpus scale with few groups, take the bounds from
    ``approx_quantiles`` instead and keep only the clip pass here.
    """
    from pyspark.sql.window import Window

    if _robust_select_applies(df):
        # Same >10k-group ValueError fallback contract as mad_outliers.
        try:
            out = _winsorize_select(
                df, key, val, id_col, lower_pct, upper_pct
            )
        except ValueError:
            out = None
        if out is not None:
            return out

    w = Window.partitionBy(key).orderBy(val, id_col)
    wc = Window.partitionBy(key)
    # NULL contract (both plans): NULL ``val`` rows are excluded from
    # ranking AND output — SQL percentile semantics, matching the
    # rank_select plan's filter.
    nn = df.select(id_col, key, val).where(F.col(val).isNotNull())
    ranked = (
        nn
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(wc))
    )
    lo_rn = F.greatest(
        F.ceil(F.col("__cnt") * F.lit(float(lower_pct))), F.lit(1)
    )
    hi_rn = F.greatest(
        F.ceil(F.col("__cnt") * F.lit(float(upper_pct))), F.lit(1)
    )
    # Bound elements ride window aggregates over the SAME key exchange
    # the rank already paid (round-11 shape, as mad_outliers): min over
    # the unique rank-matched row per group equals the old
    # filter+groupBy pick, and the broadcast-join round trip (2 extra
    # jobs at bench scale) disappears — value-identical by construction.
    out = ranked.withColumn(
        "lo_bound",
        F.min(F.when(F.col("__rn") == lo_rn, F.col(val))).over(wc),
    ).withColumn(
        "hi_bound",
        F.min(F.when(F.col("__rn") == hi_rn, F.col(val))).over(wc),
    )
    return out.select(
        id_col,
        key,
        val,
        F.greatest(
            F.least(F.col(val), F.col("hi_bound")), F.col("lo_bound")
        ).alias("clipped"),
        "lo_bound",
        "hi_bound",
    )


# Above this estimated input size the robust-stats operators switch their
# exact per-group selections from the rank window (one sort TASK per
# group — serializes when the key cardinality is small: 5 event types =
# 5-way parallelism forever, measured 29.6 s at the 10M-row rehearsal) to
# the iterative range-bucketing selection below (O(log) column-pruned
# scans, every one fully parallel).
ROBUST_SELECT_BYTES = 64 << 20

# The bucketing path collects one row per group per iteration, so it is
# FOR low-cardinality keys by construction; past this many groups the
# window path parallelizes fine and the driver traffic would not.
RANK_SELECT_MAX_GROUPS = 10_000


def rank_select(
    df: DataFrame,
    key: str,
    val: str,
    targets: dict,
    n_buckets: int = 1024,
    max_iters: int = 64,
) -> dict:
    """EXACT k-th-smallest selection per group, distributed: returns
    ``{(group, label): value}`` where ``targets`` maps label →
    ``rank_of(cnt)`` (a 1-indexed target rank as a function of the group
    row count). The classic iterative range-bucketing selection: per
    iteration ONE scan computes (count, min, max) per (group, value
    bucket) inside each group's remaining [lo, hi] range; the driver
    walks cumulative counts to the bucket containing the rank and
    recurses into that bucket's ACTUAL [min, max]. A bucket whose
    min == max IS the answer.

    Scale shape vs the window path: the window sorts each group in one
    task (parallelism = #groups); this runs ≤ max_iters column-pruned
    scans, each a map-side-combined hash aggregate at full cluster
    parallelism, and ships only #groups·n_buckets count rows per
    iteration. Convergence: every iteration either resolves or shrinks
    the value range ≥ n_buckets×, so IEEE doubles resolve in ≤
    ~(11 + 52)/log2(n_buckets) ≈ 7 iterations; mass-duplicate values
    resolve immediately (their bucket degenerates to min == max).
    Deterministic throughout — bucket arithmetic is exact-rounded double
    ops on collected bounds that ship back as plan literals (the
    kmeans-centroid convention). NULLs are excluded (SQL percentile
    semantics); NaNs are the caller's contract to pre-filter, same as
    the window path.
    """
    base = df.select(
        F.col(key).alias("k"), F.col(val).cast("double").alias("v")
    ).where(F.col(val).isNotNull())
    bounds = base.groupBy("k").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("cnt"),
    ).collect()
    if len(bounds) > RANK_SELECT_MAX_GROUPS:
        raise ValueError(
            f"rank_select is the low-cardinality-key plan "
            f"({len(bounds)} groups > {RANK_SELECT_MAX_GROUPS}); with this "
            f"many groups the rank-window path already parallelizes — "
            f"use it instead"
        )
    result: dict = {}
    state: dict = {}
    for row in bounds:
        for lbl, rank_of in targets.items():
            r = int(rank_of(row["cnt"]))
            if not (1 <= r <= row["cnt"]):
                raise ValueError(
                    f"target rank {r} out of range for group "
                    f"{row['k']!r} (cnt={row['cnt']})"
                )
            if row["lo"] == row["hi"]:
                result[(row["k"], lbl)] = row["lo"]
            else:
                state[(row["k"], lbl)] = (row["lo"], row["hi"], r)
    it = 0
    while state and it < max_iters:
        it += 1
        # Group the active selections by label so each label costs one
        # scan per iteration (ranges differ per label after iteration 1;
        # within a label each group has exactly one range).
        by_label: dict = {}
        for (k, lbl), st in state.items():
            by_label.setdefault(lbl, {})[k] = st
        for lbl, per_group in by_label.items():
            lo_map = F.create_map(
                *[F.lit(x) for k, (lo, hi, r) in per_group.items()
                  for x in (k, lo)]
            )
            hi_map = F.create_map(
                *[F.lit(x) for k, (lo, hi, r) in per_group.items()
                  for x in (k, hi)]
            )
            lo_c = F.element_at(lo_map, F.col("k"))
            hi_c = F.element_at(hi_map, F.col("k"))
            # Half-scaled bucket arithmetic: (hi - lo) overflows to +inf
            # when the range spans ~±1.7e308, collapsing every row into
            # bucket 0 forever. hi/2 - lo/2 is always finite for finite
            # doubles (each half ≤ DBL_MAX/2), and dividing both the
            # offset and the width by 2 leaves the bucket index
            # unchanged for non-overflowing ranges.
            half = F.lit(2.0)
            width_h = (hi_c / half - lo_c / half) / F.lit(float(n_buckets))
            bucket = F.least(
                F.floor(
                    (F.col("v") / half - lo_c / half) / width_h
                ).cast("bigint"),
                F.lit(n_buckets - 1),
            )
            stats = (
                base.where(
                    F.col("k").isin(list(per_group.keys()))
                    & (F.col("v") >= lo_c)
                    & (F.col("v") <= hi_c)
                )
                .groupBy("k", bucket.alias("b"))
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.min("v").alias("bmin"),
                    F.max("v").alias("bmax"),
                )
                .collect()
            )
            per_k: dict = {}
            for row in stats:
                per_k.setdefault(row["k"], []).append(row)
            for k, (lo, hi, r) in per_group.items():
                cum = 0
                for row in sorted(per_k[k], key=lambda x: x["b"]):
                    if cum + row["c"] >= r:
                        if row["bmin"] == row["bmax"]:
                            result[(k, lbl)] = row["bmin"]
                            del state[(k, lbl)]
                        elif row["bmin"] == lo and row["bmax"] == hi:
                            # Range did not shrink — with half-scaled
                            # buckets this means degenerate geometry
                            # (e.g. lo/hi denormals whose halves
                            # collide). Refuse; callers fall back to the
                            # rank-window plan on ValueError.
                            raise ValueError(
                                "rank_select: non-shrinking range for "
                                f"group {k!r} [{lo}, {hi}] — use the "
                                "window plan"
                            )
                        else:
                            state[(k, lbl)] = (
                                row["bmin"], row["bmax"], r - cum
                            )
                        break
                    cum += row["c"]
    if state:
        raise RuntimeError(f"rank_select failed to converge: {state}")
    return result


def _robust_select_applies(df: DataFrame) -> bool:
    from .dedup import _estimated_bytes

    return _estimated_bytes(df) >= ROBUST_SELECT_BYTES


def _group_table(df: DataFrame, key: str, rows: list, cols: list):
    """Per-group literal table (one row per group) with the key column
    typed like the source — the collected selections ship back into the
    plan as literals (the kmeans-centroid convention)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    key_field = next(f for f in df.schema.fields if f.name == key)
    schema = StructType(
        [StructField(key, key_field.dataType)]
        + [StructField(c, DoubleType()) for c in cols]
    )
    return df.sparkSession.createDataFrame(rows, schema)


def _mad_outliers_select(df, key, val, id_col, n_mads):
    """mad_outliers' large-input plan: both discrete medians via
    rank_select (fully parallel scans) instead of per-group rank windows
    (one sort task per group). Identical rows to the window plan — the
    r-th-smallest VALUE is selection-order independent; property-tested
    equal. Returns None on empty input (the window plan keeps the
    degenerate case). NULL ``val`` rows are excluded (same contract as
    the window plan)."""
    base = df.select(id_col, key, val).where(F.col(val).isNotNull())
    med = rank_select(base, key, val, {"m": lambda c: (c + 1) // 2})
    if not med:
        return None
    med_df = _group_table(
        df, key, [(k, float(v)) for (k, _), v in med.items()], ["med"]
    )
    dev = base.join(F.broadcast(med_df), key).select(
        id_col, key, F.abs(F.col(val) - F.col("med")).alias("adev")
    )
    mad = rank_select(dev, key, "adev", {"m": lambda c: (c + 1) // 2})
    mad_df = _group_table(
        df, key, [(k, float(v)) for (k, _), v in mad.items()], ["mad"]
    )
    return (
        base.join(F.broadcast(med_df), key)
        .join(F.broadcast(mad_df), key)
        .where(
            F.abs(F.col(val) - F.col("med"))
            > F.lit(float(n_mads)) * F.col("mad")
        )
        .select(id_col, key, val, "med", "mad")
    )


def _winsorize_select(df, key, val, id_col, lower_pct, upper_pct):
    """winsorize's large-input plan: both percentile elements via
    rank_select. Rank math mirrors the window plan bit-for-bit —
    ``ceil(cnt * pct)`` in double arithmetic (Python floats ARE IEEE
    doubles), clamped to ≥ 1."""
    import math

    # Same NULL contract as the window plan: NULL ``val`` rows excluded.
    base = df.select(id_col, key, val).where(F.col(val).isNotNull())
    sel = rank_select(
        base,
        key,
        val,
        {
            "lo": lambda c: max(math.ceil(c * float(lower_pct)), 1),
            "hi": lambda c: max(math.ceil(c * float(upper_pct)), 1),
        },
    )
    if not sel:
        return None
    groups = sorted({k for (k, _) in sel})
    bounds = _group_table(
        df,
        key,
        [
            (k, float(sel[(k, "lo")]), float(sel[(k, "hi")]))
            for k in groups
        ],
        ["lo_bound", "hi_bound"],
    )
    out = base.join(F.broadcast(bounds), key)
    return out.select(
        id_col,
        key,
        val,
        F.greatest(
            F.least(F.col(val), F.col("hi_bound")), F.col("lo_bound")
        ).alias("clipped"),
        "lo_bound",
        "hi_bound",
    )


def heavy_hitters(
    df: DataFrame, col: str, phi: float = 0.001
) -> DataFrame:
    """EXACT heavy hitters — every value with frequency > ``phi``·N —
    computed with SKETCH-BOUNDED memory instead of a full-vocabulary
    aggregate (the Misra-Gries two-pass construction):

    1. CANDIDATE pass: each partition summarizes its rows with a
       Misra-Gries sketch of c = ⌈1/phi⌉ counters (Arrow-batched:
       pandas ``value_counts`` per batch merged into the counter dict,
       then one decrement step caps it back to c). Pigeonhole
       guarantee: if a value's GLOBAL count f > phi·N, then in at
       least one partition f_p > phi·n_p (otherwise f = Σf_p ≤
       phi·Σn_p = phi·N), and MG with c counters never evicts a value
       whose partition count exceeds n_p/c — so every true heavy
       hitter survives SOME partition's sketch. False candidates are
       possible; misses are not.
    2. EXACT pass: the candidate set (≤ c per partition, typically far
       fewer) broadcast-semi-joins back onto the column and only those
       rows aggregate; the global N comes from a 1-row count that
       cross-joins on (the established broadcast-scalar pattern).
       The final filter cnt > phi·N makes the output EXACT — the
       oracle is a plain GROUP BY ... HAVING.

    Why not ``groupBy(col).count()`` directly (``vocab_topk``): at
    100 TB the full-vocabulary hash aggregate shuffles one record per
    DISTINCT value — fine at 10⁶ vocab, ruinous at 10¹⁰ (URLs,
    n-grams, user ids). Here nothing corpus-sized ever shuffles;
    everything is scan-shaped. Deterministic output (exact counts, no
    sketch values exposed).

    Scan economy: the global N rides the CANDIDATE pass (each
    partition's sketch frame carries its non-null row count in a
    ``__pn`` side row), so the whole operator is TWO scans — sketch,
    recount — not three. The sketch output is bounded by construction
    at (c+1)·P rows, which puts it in the engine's bounded-collect
    class (kmeans stats convention): it collects to the driver, N
    becomes a plan literal, and the candidate set broadcast-joins the
    recount. Above ``HH_COLLECT_MAX`` expected rows (tiny phi × many
    partitions) the same pass stays a DataFrame and N comes from a
    third scan — correctness identical, one extra scan.

    Returns (value, cnt), cnt > phi·N, descending by (cnt, value).
    """
    import math

    import pandas as pd

    c = max(1, math.ceil(1.0 / phi))

    from collections import Counter

    def _mg(batches):
        counters: dict = {}
        n = 0
        for pdf in batches:
            # Counter over the raw array measured ~2.6x faster than a
            # per-batch value_counts at the 1k-row Arrow batch size
            vc = Counter(pdf[col].dropna().to_numpy())
            n += sum(vc.values())
            for val, cnt in vc.items():
                counters[val] = counters.get(val, 0) + int(cnt)
            if len(counters) > c:
                # decrement step: drop the (len-c) smallest counts from
                # every counter (batched form of MG's per-item decrement;
                # same survivor guarantee — a counter only dies if its
                # count is among the len-c smallest)
                d = sorted(counters.values())[len(counters) - c - 1]
                counters = {
                    v: n2 - d for v, n2 in counters.items() if n2 > d
                }
        out = pd.DataFrame({col: list(counters.keys())})
        out["__pn"] = None
        yield pd.concat(
            [out, pd.DataFrame({col: [None], "__pn": [n]})],
            ignore_index=True,
        )

    dtype = df.schema[col].dataType.simpleString()
    sketch = df.select(col).mapInPandas(
        _mg, schema=f"{col} {dtype}, __pn bigint"
    )
    # Partition-count bound for the collect gate, from the SAME
    # metadata-only size estimate spread() uses: one (over-counted)
    # partition per 16 MB of input, floored at BOTH the core count and
    # the session's shuffle fan-out (shuffle-output inputs have
    # spark.sql.shuffle.partitions tasks regardless of size — the
    # round-11 review's undercount case). An overestimate only routes to
    # the distributed path early (both paths exact);
    # ``df.rdd.getNumPartitions()`` would be exact but forces a full
    # plan-to-RDD translation (~0.4 s of pure driver latency per call,
    # any scale). Remaining deliberate undercounts: many-small-files
    # scans (openCostInBytes inflates splits past bytes/16MB) and
    # unknown-stats plans (estimate 0) can still exceed the bound — only
    # the bounded-collect guarantee weakens, never exactness, and
    # HH_COLLECT_MAX keeps ~order-of-magnitude headroom for it (2M rows
    # of (value, count) pairs is tens of MB on a driver sized in GBs).
    from .dedup import _estimated_bytes

    spark = df.sparkSession
    try:
        shuffle_parts = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:  # e.g. "auto" under some AQE configs
        shuffle_parts = 200
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        shuffle_parts,
        _estimated_bytes(df) // (16 << 20),
    )
    if (c + 1) * max(1, n_parts) <= HH_COLLECT_MAX:
        rows = sketch.collect()  # ≤ (c+1)·P rows by construction
        total = sum(r["__pn"] for r in rows if r["__pn"] is not None)
        vals = sorted({r[col] for r in rows if r[col] is not None})
        if len(vals) <= HH_ISIN_MAX:
            # Round 15 (guide §2.4): the candidate set is usually tens
            # of values (≤ (c+1)·P by construction, c+1 per partition
            # SEEN, far fewer after dedup) — an InSet literal filter on
            # the recount scan replaces the whole
            # createDataFrame → BroadcastExchange → semi-join chain
            # (one plan node vs a driver round-trip, a broadcast build
            # and a join; interleaved A/B below). The gate keeps huge
            # candidate sets (tiny phi × many partitions) off the plan
            # — a multi-MB IN-list bloats every task closure — on the
            # broadcast path instead.
            cand_filter = F.col(col).isin(vals)
        else:
            cand = df.sparkSession.createDataFrame(
                [(v,) for v in vals], schema=f"{col} {dtype}"
            )
            return (
                df.join(F.broadcast(cand), on=col, how="left_semi")
                .groupBy(col)
                .agg(F.count(F.lit(1)).alias("cnt"))
                .where(
                    F.col("cnt") > F.lit(float(phi)) * F.lit(int(total))
                )
                .select(col, "cnt")
                .orderBy(F.desc("cnt"), F.asc(col))
            )
        return (
            df.where(cand_filter)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > F.lit(float(phi)) * F.lit(int(total)))
            .select(col, "cnt")
            .orderBy(F.desc("cnt"), F.asc(col))
        )
    cand = sketch.where(F.col(col).isNotNull()).select(col).distinct()
    return exact_recount(df, col, cand, phi)


# Bounded-collect ceiling for the heavy-hitter sketch pass: above this
# many expected candidate rows ((1 + 1/phi) x input partitions) the
# sketch stays distributed and N costs one extra scan.
HH_COLLECT_MAX = 2_000_000

# Largest OBSERVED candidate set the recount attaches as an InSet
# literal filter; bigger sets go through the broadcast semi-join (an
# IN-list is serialized into every task closure, a broadcast is shipped
# once per executor). 10k values of (token-sized) strings is ~100 KB of
# plan — well under closure-bloat territory.
HH_ISIN_MAX = 10_000


def exact_recount(
    df: DataFrame, col: str, cand: DataFrame, phi: float
) -> DataFrame:
    """Shared EXACT pass of the heavy-hitter family (batch
    ``heavy_hitters`` and the streaming candidate maintenance): recount
    a candidate set against the full column and keep cnt > phi·N.
    ``cand`` must be a SUPERSET of the true hitters (the MG guarantee);
    the recount then makes the output exact regardless of how the
    candidates were mined — false candidates fall to the HAVING filter,
    misses are impossible by the superset contract."""
    total = df.where(F.col(col).isNotNull()).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        df.join(F.broadcast(cand.select(col).distinct()), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.lit(phi) * F.col("__n"))
        .select(col, "cnt")
        .orderBy(F.desc("cnt"), F.asc(col))
    )


GHH_MAX_SKETCH_GROUPS = 100_000

# Per-partition live-entry budget for the group_heavy_hitters sketch
# dicts: past ~this many counter entries ((c+1) per group present) the
# partition FLUSHES its sketches/totals as output rows and restarts with
# empty dicts. A flush segment is a valid MG mini-partition (pigeonhole
# survives splitting: f > phi·n over the partition implies f > phi·n_seg
# in some segment, by the same Σ argument as the partition-level proof),
# so candidates stay a superset and the recount keeps the output exact.
# 2^20 entries ≈ tens of MB of Python dict — executor-safe even when the
# group cardinality approaches the partition row count.
GHH_FLUSH_ENTRIES = 1 << 20

# Coarse pre-gate budget: inputs estimated LARGER than this pay one
# approx_count_distinct(group) scan before sketching, so an input that
# is clearly in the high-G fallback regime never builds (and then
# discards) the sketch pass at all. Small inputs skip the probe — the
# wasted-sketch cost it avoids is proportional to input size.
GHH_PREGATE_BYTES = 1 << 30


def group_heavy_hitters(
    df: DataFrame, group: str, col: str, phi: float = 0.01,
    max_sketch_groups: int = GHH_MAX_SKETCH_GROUPS,
) -> DataFrame:
    """Per-GROUP exact heavy hitters — every value whose frequency
    within its group exceeds ``phi``·n_group — the per-language
    stopword / per-source boilerplate induction shape, built on the
    same Misra-Gries two-pass as ``heavy_hitters``:

    1. CANDIDATE pass: each partition keeps one MG sketch of
       c = ⌈1/phi⌉ counters PER GROUP present in the partition
       (pigeonhole per group: f_{g,v} > phi·n_g implies
       f > phi·n_{g,p} in some partition p, and the per-group batched
       decrement preserves the (c+1)·d mass-removal invariant within
       that group's substream — no per-group hitter is ever lost).
       Each group's per-partition row count rides the same frame as a
       ``__pn`` side row, so per-group totals cost NO extra scan.
    2. EXACT pass: candidates broadcast-semi-join the (group, value)
       stream, the recount joins the G-bounded totals, and
       cnt > phi·n_g filters — EXACT output, plain windowed-HAVING
       oracle.

    Memory contract (round-12 hardening): the per-partition sketch dicts
    hold ≤ (c+1) entries per group PRESENT in the partition, which at
    high group cardinality approaches one entry per row — GBs of Python
    dict for a large partition. ``GHH_FLUSH_ENTRIES`` bounds that: past
    the budget the partition flushes its sketches/totals as output rows
    and restarts. A flush segment is a valid MG mini-partition — the
    pigeonhole argument splits: f > phi·n over the partition implies
    f > phi·n_seg in some segment — so candidates remain a superset and
    the recount keeps the output exact (totals rows are additive under
    the downstream per-group SUM; duplicate candidate rows fall to the
    DISTINCT). The SECOND-pass blowup risk is the candidate broadcast
    (≤ c×G rows), gated twice:

    - COARSE pre-gate: inputs estimated above ``GHH_PREGATE_BYTES`` pay
      one ``approx_count_distinct(group)`` scan first; since every group
      present contributes ≥ 1 candidate, an estimate clearly past
      ``max_sketch_groups × c`` proves the observed gate below would
      fire — route to the exact fallback WITHOUT building (and then
      discarding) the sketch pass. Small inputs skip the probe: the
      wasted-sketch cost it would avoid is itself small.
    - OBSERVED gate: the actual candidate count off the (checkpointed,
      sketch-bounded) candidate frame — the gate variable is the real
      broadcast size, catching borderline cases the coarse estimate
      missed. Candidates > ``max_sketch_groups × c`` route to the plain
      per-(group, value) aggregate + per-group window total: with that
      many candidates the vocabulary shuffle IS candidate-bounded
      already, and the broadcast would be the blowup.

    All paths are EXACT, so no gate can change values. Rows with a NULL
    group or NULL value are excluded (same contract both engines).

    Returns (group, value, cnt), ordered by (group, cnt desc, value).
    """
    import math

    import pandas as pd

    base = df.where(F.col(group).isNotNull() & F.col(col).isNotNull())

    def _fallback() -> DataFrame:
        from pyspark.sql.window import Window

        counts = base.groupBy(group, col).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # per-group total via a window over the already-(group,value)-
        # bounded counts — one group-keyed exchange, no join, no
        # second base scan
        n_g = F.sum("cnt").over(Window.partitionBy(group))
        return (
            counts.withColumn("__n", n_g)
            .where(F.col("cnt") > F.lit(phi) * F.col("__n"))
            .select(group, col, "cnt")
            .orderBy(F.asc(group), F.desc("cnt"), F.asc(col))
        )

    c = max(1, math.ceil(1.0 / phi))

    from .dedup import _estimated_bytes

    if _estimated_bytes(base) > GHH_PREGATE_BYTES:
        # Coarse pre-gate (see docstring): the 0.8 margin absorbs HLL
        # error in the conservative direction — the pre-gate fires only
        # when CLEARLY past budget; borderline inputs still sketch and
        # hit the observed gate. Both paths exact, so routing here can
        # never change values.
        g_est = base.agg(
            F.approx_count_distinct(group).alias("__g")
        ).collect()[0]["__g"]
        if g_est * 0.8 > max_sketch_groups * c:
            return _fallback()

    from collections import Counter

    # bound driver-side so the closure ships the VALUE (executor
    # workers re-import the module; a global read there would not see a
    # driver-side override, e.g. in tests)
    flush_entries = GHH_FLUSH_ENTRIES

    def _mg(batches):
        sketches: dict = {}
        totals: dict = {}

        def _rows():
            return [
                (g, v, None) for g, cs in sketches.items() for v in cs
            ] + [(g, None, n) for g, n in totals.items()]

        for pdf in batches:
            sub = pdf[[group, col]].dropna()
            # Counter(zip(...)) measured ~1.7x faster than a pandas
            # groupby per ~1k-row Arrow batch (fixed groupby overhead
            # dominates at this batch size); semantics identical.
            pairs = Counter(
                zip(sub[group].to_numpy(), sub[col].to_numpy())
            )
            for (g, val), cnt in pairs.items():
                totals[g] = totals.get(g, 0) + int(cnt)
                counters = sketches.setdefault(g, {})
                counters[val] = counters.get(val, 0) + int(cnt)
                if len(counters) > c:
                    d = sorted(counters.values())[len(counters) - c - 1]
                    sketches[g] = {
                        v: n - d for v, n in counters.items() if n > d
                    }
            # Per-group dicts are decrement-capped at c entries, so the
            # live footprint is ≤ (c+1)·len(sketches); flush-and-reset
            # when it passes the budget (checked per Arrow batch — the
            # overshoot within one batch is bounded by the batch rows).
            # Each segment is a valid MG mini-partition (docstring), so
            # exactness is unaffected.
            if len(sketches) * (c + 1) > flush_entries:
                yield pd.DataFrame(_rows(), columns=[group, col, "__pn"])
                sketches, totals = {}, {}
        yield pd.DataFrame(_rows(), columns=[group, col, "__pn"])

    gtype = df.schema[group].dataType.simpleString()
    vtype = df.schema[col].dataType.simpleString()
    sketch = df.select(group, col).mapInPandas(
        _mg, schema=f"{group} {gtype}, {col} {vtype}, __pn bigint"
    ).localCheckpoint(eager=False)
    # SIZE GATE on the observed candidate count (this count also
    # materializes the checkpoint the happy path reuses, so it is the
    # probe job — not an extra one): past the broadcast budget, the
    # recount's candidate broadcast is the memory blowup, and the plain
    # (group, value) aggregate is the cheaper exact plan.
    n_cand = sketch.where(F.col(col).isNotNull()).count()
    if n_cand > max_sketch_groups * c:
        return _fallback()
    totals = (
        sketch.where(F.col(col).isNull())
        .groupBy(group)
        .agg(F.sum("__pn").alias("__n"))
    )
    cand = (
        sketch.where(F.col(col).isNotNull())
        .select(group, col)
        .distinct()
    )
    return (
        base.join(F.broadcast(cand), on=[group, col], how="left_semi")
        .groupBy(group, col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(totals), on=group)
        .where(F.col("cnt") > F.lit(phi) * F.col("__n"))
        .select(group, col, "cnt")
        .orderBy(F.asc(group), F.desc("cnt"), F.asc(col))
    )
