"""Semantic checks for the LLM-pipeline operators beyond raw oracle parity."""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE

import __spark_entry__ as entrymod
from data_lakehouse_hygiene_spark.operators import multimodal


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_recall_of_true_pairs(spark):
    """LSH candidates + est-Jaccard filter must recover the planted
    near-duplicate pairs (exact 3-gram Jaccard >= 0.5) with high recall."""
    qs = entrymod.queries()
    truth = _pairs(qs["ngram_jaccard"](spark, SF_ORACLE))
    found = _pairs(qs["minhash_near_dup"](spark, SF_ORACLE))
    assert truth, "fixture should contain planted near-dup pairs"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.8, f"minhash recall too low: {recall} ({len(truth)} true)"


def test_lsh_ann_subset_of_brute_force_ranks(spark):
    """Every ANN hit must score identically to the brute-force result for
    the same (query, candidate) pair."""
    qs = entrymod.queries()
    brute = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in qs["cosine_topk"](spark, SF_ORACLE).collect()
    }
    for r in qs["lsh_ann"](spark, SF_ORACLE).collect():
        key = (r["query_id"], r["vec_id"])
        if key in brute:
            assert brute[key] == r["cosine"]


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG", "image/png")


def test_approx_quantiles_within_tolerance(spark):
    """The sketch quantiles must sit within 1% rank error of exact."""
    import duckdb

    res = entrymod.queries()["approx_quantiles"](spark, SF_ORACLE).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_ORACLE}/lineitem.parquet'"
    )
    for name, p in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)]:
        lo, hi = con.execute(
            "SELECT quantile_disc(l_extendedprice, ?), quantile_disc(l_extendedprice, ?)"
            " FROM lineitem",
            [max(p - 0.01, 0.0), min(p + 0.01, 1.0)],
        ).fetchone()
        assert lo <= res[name] <= hi, (name, lo, res[name], hi)
