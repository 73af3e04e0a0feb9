"""Property-based tests (hypothesis) for the cross-engine parity core.

Everything in the engine leans on three primitives: floor-quantize
rounding, DECIMAL exact sums, and the md5-derived portable hash. If these
hold for arbitrary inputs, per-query parity follows; these tests attack
them directly with generated data.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_lakehouse_hygiene_spark.operators.aggregates import exact_sum, quantize
from data_lakehouse_hygiene_spark.operators.dedup import base_hash

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_doubles = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.lists(finite_doubles, min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_quantize_matches_python_floor(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = [r[0] for r in df.select(quantize(F.col("x"), 2)).collect()]
    want = [math.floor(x * 100.0 + 0.5) / 100.0 for x in xs]
    assert got == want


@given(
    st.lists(
        st.decimals(
            min_value=-99999, max_value=99999, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_exact_sum_is_partition_order_independent(spark, ds):
    rows = [(float(d),) for d in ds]
    df = spark.createDataFrame(rows, "x double")
    one = df.coalesce(1).agg(exact_sum("x")).collect()[0][0]
    many = df.repartition(7).agg(exact_sum("x")).collect()[0][0]
    rev = spark.createDataFrame(list(reversed(rows)), "x double").agg(
        exact_sum("x")
    ).collect()[0][0]
    assert one == many == rev


@given(st.lists(st.text(alphabet=st.characters(codec="ascii"), max_size=40), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_base_hash_matches_duckdb(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r[0]: r[1] for r in df.select("s", base_hash(F.col("s"))).collect()}
    con = duckdb.connect()
    for s in strings:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[s] == want, s


@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(
    width=st.integers(min_value=1, max_value=1024),
    height=st.integers(min_value=1, max_value=512),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_roundtrip_property(width, height, seed):
    """decode(make_bmp(w, h)) must recover exactly (w, h, 24) for any
    dimensions — the decoder reads bytes, not conventions."""
    from data_lakehouse_hygiene_spark.operators import multimodal

    d = multimodal.decode_media(multimodal.make_bmp(width, height, seed), "image/bmp")
    assert (d["width"], d["height"], d["bpp"]) == (width, height, 24)


@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow], deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=384_000),
    n=st.integers(min_value=0, max_value=100_000),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wav_roundtrip_property(rate, n, seed):
    from data_lakehouse_hygiene_spark.operators import multimodal

    d = multimodal.decode_media(multimodal.make_wav(rate, n, seed), "audio/wav")
    assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (rate, 1, n)
