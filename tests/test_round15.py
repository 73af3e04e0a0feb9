"""Round-15 pins: the in-row gaps-and-islands span merge
(``dedup._island_spans``) and the gap-slice rebuild (``dedup._cut_spans``)
that replaced the substring family's window-based island pass — asserted
against brute-force Python references on randomized inputs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _ref_islands(ps: list[int], k: int) -> list[tuple[int, int, int]]:
    """Brute-force gaps-and-islands over sorted positions: break where
    pos >= running max(prev pos + k); emit (start, end, n_grams)."""
    spans = []
    for p in ps:
        if spans and p < spans[-1][1]:
            spans[-1] = (spans[-1][0], max(spans[-1][1], p + k), spans[-1][2] + 1)
        else:
            spans.append((p, p + k, 1))
    return spans


def test_island_spans_matches_bruteforce_reference(spark):
    from data_lakehouse_hygiene_spark.operators import dedup

    rng = random.Random(1543)
    k = 8
    rows = []
    for doc_id in range(200):
        n = rng.randint(1, 60)
        ps = sorted(rng.sample(range(0, 400), n))
        rows.append((doc_id, ps))
    df = spark.createDataFrame(rows, "doc_id int, __ps array<int>")
    got = {
        r["doc_id"]: [
            (s["span_start"], s["span_end"], s["n_grams"]) for s in r["ss"]
        ]
        for r in df.select(
            "doc_id", dedup._island_spans("__ps", k).alias("ss")
        ).collect()
    }
    for doc_id, ps in rows:
        assert got[doc_id] == _ref_islands(ps, k), (doc_id, ps)


def test_cut_spans_gap_slices_match_per_token_filter(spark):
    """The O(tokens + spans) gap-slice rebuild must keep exactly the
    tokens the old O(tokens x spans) covered-by-any-span filter kept."""
    from data_lakehouse_hygiene_spark.operators import dedup

    rng = random.Random(77)
    k = 5
    rows = []
    expected = {}
    for doc_id in range(120):
        n_toks = rng.randint(0, 50)
        toks = [f"t{doc_id}_{i}" for i in range(n_toks)]
        # random sorted positions eligible for islands (may be empty ->
        # the doc is absent from sp and must come back untouched)
        n_pos = rng.randint(0, max(0, n_toks - k))
        ps = sorted(rng.sample(range(0, max(1, n_toks - k + 1)), n_pos)) if n_pos else []
        spans = _ref_islands(ps, k)
        kept = [
            t
            for i, t in enumerate(toks)
            if not any(s <= i < e for s, e, _ in spans)
        ]
        expected[doc_id] = (" ".join(kept), n_toks - len(kept))
        rows.append((doc_id, toks, ps))
    base = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id int, __toks array<string>"
    )
    sp_rows = [
        (
            d,
            [
                {"span_start": s, "span_end": e, "n_grams": n}
                for s, e, n in _ref_islands(ps, k)
            ],
        )
        for d, _, ps in rows
        if ps
    ]
    sp = spark.createDataFrame(
        sp_rows,
        "doc_id int, __ss array<struct<"
        "span_start:bigint,span_end:bigint,n_grams:bigint>>",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in dedup._cut_spans(base, sp).collect()
    }
    assert got == expected
