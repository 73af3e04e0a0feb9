"""The prescriptive scoring engine — A8/A9/A10 (SURVEY.md §2.4) as native
column algebra.

Reference (``/root/reference/elt/prescriptive/prescriptive_logic.py``):
- per-row weighted score via a row-apply UDF (``hitung_per_baris``,
  ``:103-108``): ``durasi * (met/10)``, × outdoor factor when the category
  contains "outdoor";
- dirtiness = ``min(sum(score)/15, 10)`` (``:109,146``);
- odor = count of sweat-inducing activities (``filter_bau`` ``:124-133``),
  humidity-adjusted, clamped;
- environment factor from the latest weather/AQI rows (``:72-73,99-101``);
- final = 0.4/0.4/0.2 weighted blend (``:139-154``);
- CASE ladder → recommendation label (``:153-173``).

De-UDF'd: everything is ``when/otherwise``, ``least``, arithmetic — pure
Catalyst expressions inside whole-stage codegen. The reference's
``datetime.utcnow()`` (``:59``) is replaced by an explicit ``as_of`` marker
(SURVEY.md §4.2) so runs are reproducible and oracle-checkable.

Scale: the fact side is filtered (pushdown) then broadcast-joined to the dim
and aggregated with map-side partials — one shuffle of partial aggregates,
~O(bytes scanned), no sort, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregates import exact_sum, quantize
from .joins import dim_join, window_after_event

# CASE-ladder thresholds (prescriptive_logic.py:157-173)
LABEL_NOW = "WAJIB MANDI SEKARANG"
LABEL_ODOR = "WAJIB MANDI (Faktor Bau)"
LABEL_RECOMMENDED = "SANGAT DISARANKAN"
LABEL_DEFER = "MANDI BISA DITUNDA"
LABEL_NONE = "Tidak Perlu Mandi"


def row_score(duration: Column, met: Column, category: Column, outdoor_factor: float = 1.5) -> Column:
    """A8 per-row weighted score (de-UDF of ``hitung_per_baris``)."""
    base = duration * (met / F.lit(10.0))
    return F.when(
        F.lower(category).contains("outdoor") | F.lower(category).contains("building"),
        base * F.lit(outdoor_factor),
    ).otherwise(base)


def clamp10(x: Column) -> Column:
    """min(x, 10) clamp (prescriptive_logic.py:146,151)."""
    return F.least(x, F.lit(10.0))


def case_classify(score: Column, odor: Column) -> Column:
    """A9: threshold ladder + odor override (prescriptive_logic.py:153-173)."""
    return (
        F.when(odor >= F.lit(9.0), F.lit(LABEL_ODOR))
        .when(score >= F.lit(6.0), F.lit(LABEL_NOW))
        .when(score >= F.lit(5.0), F.lit(LABEL_RECOMMENDED))
        .when(score >= F.lit(4.0), F.lit(LABEL_DEFER))
        .otherwise(F.lit(LABEL_NONE))
    )


def hygiene_result_single_source(
    activities: DataFrame,
    dims: DataFrame,
    marker_pred: Column,
    *,
    act_ts: str,
    act_value: str,
    act_key: str,
    dim_key: str,
    dim_met: str,
    dim_category: str,
) -> DataFrame:
    """``hygiene_result`` specialized for markers/env drawn from the
    activities table itself (the driver-fixture mapping): all four scalar
    aggregates — clock, last-marker, env sum/count — collapse into ONE
    conditional-aggregate scan, so the fact table is read exactly twice
    (scalars pass + window pass) instead of four times. At 100 TB that is
    the difference between 2 and 4 full-table scans per run.
    """
    # One conditional-aggregate scan produces all four scalars; collecting the
    # single row driver-side (the reference's own pattern for env factors,
    # prescriptive_logic.py:99-101) turns the window bound into a LITERAL
    # predicate — which pushes down to the Parquet scan (rowgroup/partition
    # skipping on ts), instead of a non-pushable broadcast theta-join.
    s = activities.agg(
        F.max(F.col(act_ts)).alias("__now"),
        F.max(F.when(marker_pred, F.col(act_ts))).alias("__last"),
        exact_sum(F.col(act_value), scale=2).alias("__env_sum"),
        F.count(F.lit(1)).alias("__env_n"),
    ).collect()[0]

    def _ts_lit(v):
        # Route the collected naive datetime through an ISO STRING literal:
        # ``F.lit(datetime)`` builds a session-zone TimestampType literal by
        # converting the naive value with the OS-LOCAL timezone (mktime), so
        # under a non-UTC host zone the later NTZ cast lands hours off. A
        # string parsed straight to TIMESTAMP_NTZ never touches a zone.
        if v is None:
            return F.lit(None).cast("timestamp_ntz")
        return F.lit(v.isoformat(sep=" ")).cast("timestamp_ntz")

    # P8: pushable window predicate. NULL marker (no marker rows) → NULL
    # predicate → empty window, matching the SQL `ts > NULL` semantics.
    win = activities.where(F.col(act_ts) > _ts_lit(s["__last"]))
    if act_key == dim_key:
        joined = dim_join(win, dims, on=act_key)
    else:
        joined = win.join(
            F.broadcast(dims), on=win[act_key] == dims[dim_key], how="left"
        )

    met = F.col(dim_met) / F.lit(1000.0)
    score = row_score(F.col(act_value), met, F.col(dim_category))
    sweaty = (F.col(dim_met) > F.lit(5000.0)) | F.lower(
        F.col(dim_category)
    ).contains("building")

    agg = joined.agg(
        exact_sum(quantize(score, 2), scale=2).alias("__sum_score"),
        F.sum(F.when(sweaty, 1).otherwise(0)).alias("__n_sweaty"),
        F.count(F.lit(1)).alias("__n_acts"),
    )
    one = agg.select(
        "*",
        _ts_lit(s["__now"]).alias("__now"),
        _ts_lit(s["__last"]).alias("__last"),
        F.lit(s["__env_sum"]).cast("double").alias("__env_sum"),
        F.lit(s["__env_n"]).cast("bigint").alias("__env_n"),
    )
    return _finalize(one)


def _finalize(one: DataFrame) -> DataFrame:
    """Shared tail: scalar algebra + CASE ladder over the 1-row frame with
    columns __now/__last/__env_sum/__env_n/__sum_score/__n_sweaty/__n_acts."""
    hours = (
        F.unix_timestamp(F.col("__now")) - F.unix_timestamp(F.col("__last"))
    ) / F.lit(3600.0)
    env_avg = F.col("__env_sum") / F.col("__env_n")
    env_factor = F.greatest(F.lit(1.0), env_avg / F.lit(100.0))

    skor_kekotoran = clamp10(F.col("__sum_score") / F.lit(15.0))
    skor_bau = clamp10(F.col("__n_sweaty").cast("double") * env_factor / F.lit(2.0))
    skor_aqi = clamp10(env_avg / F.lit(50.0))
    skor_final = (
        F.lit(0.4) * skor_kekotoran + F.lit(0.4) * skor_bau + F.lit(0.2) * skor_aqi
    )
    return one.select(
        F.col("__last").alias("waktu_mandi_terakhir"),
        quantize(hours, 2).alias("jam_sejak_mandi"),
        quantize(skor_kekotoran, 2).alias("skor_kekotoran"),
        quantize(skor_bau, 2).alias("skor_bau"),
        quantize(skor_aqi, 2).alias("skor_aqi"),
        quantize(skor_final, 2).alias("skor_final"),
        case_classify(quantize(skor_final, 2), quantize(skor_bau, 2)).alias(
            "rekomendasi"
        ),
        F.col("__n_acts").alias("jumlah_aktivitas"),
    )


def hygiene_result(
    activities: DataFrame,
    dims: DataFrame,
    markers: DataFrame,
    env: DataFrame,
    *,
    act_ts: str,
    act_value: str,
    act_key: str,
    dim_key: str,
    dim_met: str,
    dim_category: str,
    marker_ts: str,
    env_value: str,
) -> DataFrame:
    """The flagship query: S5→P8→J2→A8→A1/A2/A3→A9→O2 in one lazy plan.

    Returns ONE row: last marker time, hours since, component scores, final
    weighted score, CASE recommendation. ``markers``/``env`` are tiny 1-row
    aggregates broadcast against the fact — the fact table is touched by
    exactly one filtered, column-pruned scan.
    """
    # A1: deterministic "now" = latest fact timestamp (no utcnow()).
    clock = activities.agg(
        F.max(F.col(act_ts)).alias("__now"),
    )
    marker = markers.agg(F.max(F.col(marker_ts)).alias("__last"))

    # P8: activity window since the marker; J2: broadcast dim join.
    win = window_after_event(activities, markers, act_ts, marker_ts)
    if act_key == dim_key:
        joined = dim_join(win, dims, on=act_key)
    else:
        joined = win.join(
            F.broadcast(dims), on=win[act_key] == dims[dim_key], how="left"
        )

    # A8: per-row score; exact decimal sum for order-independence.
    met = F.col(dim_met) / F.lit(1000.0)
    score = row_score(F.col(act_value), met, F.col(dim_category))
    sweaty = (F.col(dim_met) > F.lit(5000.0)) | F.lower(
        F.col(dim_category)
    ).contains("building")

    # Quantize the per-row score to 2 decimals BEFORE the decimal sum: the
    # floor-trick is bit-identical across engines, and a 2-decimal-valued
    # double casts to DECIMAL(18,2) unambiguously (no boundary sensitivity).
    agg = joined.agg(
        exact_sum(quantize(score, 2), scale=2).alias("__sum_score"),
        F.sum(F.when(sweaty, 1).otherwise(0)).alias("__n_sweaty"),
        F.count(F.lit(1)).alias("__n_acts"),
    )

    # A10: scalar env factor from the latest env reading (1-row broadcast).
    env1 = env.agg(exact_sum(F.col(env_value), scale=2).alias("__env_sum"),
                   F.count(F.lit(1)).alias("__env_n"))

    one = (
        agg.join(F.broadcast(clock))
        .join(F.broadcast(marker))
        .join(F.broadcast(env1))
    )
    return _finalize(one)
