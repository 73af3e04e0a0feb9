"""Physical-plan regression guards: the properties PLANS.md documents must
survive future edits — a correct-but-shuffling plan is a regression even
when every value still matches the oracle."""

from __future__ import annotations

import re

import pytest

from .conftest import SF_ORACLE

import __spark_entry__ as entrymod
from data_lakehouse_hygiene_spark import maintenance
from data_lakehouse_hygiene_spark.schemas import load_table


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_ORACLE)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


@pytest.mark.parametrize(
    "name",
    ["dim_join", "fact_dim_join", "hygiene_score", "ivf_ann", "cosine_topk"],
)
def test_joins_broadcast_never_sortmerge(spark, name):
    plan = _plan(spark, name)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


@pytest.mark.parametrize(
    "name", ["token_count", "quality_score", "lang_id", "cast_numeric"]
)
def test_per_row_operators_shuffle_free(spark, name):
    plan = _plan(spark, name)
    assert "Exchange" not in plan, plan


def test_embedding_near_dup_no_cartesian(spark):
    """The exact all-pairs cosine compare must run block-pair-replicated —
    each (i, j) block pair on one task via the cogrouped Arrow kernel —
    never a Cartesian/nested-loop product, never a sort-merge join."""
    plan = _plan(spark, "embedding_near_dup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "FlatMapCoGroupsInPandas" in plan, plan


def test_cosine_pairs_kernel_matches_catalyst(spark):
    """The Arrow numpy kernel must be bit-identical to the pure-Catalyst
    shuffle-hash formulation (same quantized integer dot products)."""
    from data_lakehouse_hygiene_spark.operators import similarity

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = sorted(
        tuple(r) for r in similarity.cosine_pairs(df).collect()
    )
    want = sorted(
        tuple(r) for r in similarity.cosine_pairs_catalyst(df).collect()
    )
    assert got == want
    assert len(got) > 0


def test_simhash_near_dup_no_join_single_sig_pass(spark):
    """Band-blocked simhash generates pairs in-row: no join operator at
    all, and the shingle explode (the expensive subtree) appears once."""
    plan = _plan(spark, "simhash_near_dup")
    assert "Join" not in plan, plan
    assert plan.count("documents.parquet") == 1, plan


def test_range_join_is_equi_never_nested_loop(spark):
    """The bucketed interval join must plan as an EQUI-join (hash keys
    (user, bucket), containment as residual filter) — a naive theta join
    here plans BroadcastNestedLoopJoin, the quadratic trap at scale."""
    plan = _plan(spark, "range_join")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_cdc_apply_partial_aggregated_no_window(spark):
    """cdc_apply must stay a partial-aggregated max-of-struct (one row per
    key per map partition crosses the shuffle) — never a row_number
    window, which would shuffle the whole changelog."""
    plan = _plan(spark, "cdc_apply")
    assert "Window" not in plan, plan
    # partial + final pair of the sort-based struct aggregate
    assert plan.count("SortAggregate") >= 2, plan


def test_hygiene_score_single_fact_scan(spark):
    plan = _plan(spark, "hygiene_score")
    assert plan.count("events.parquet") == 1, plan


_PLAN_EXEMPT = {
    # streaming plans finalize per micro-batch; dedup_clusters is a
    # driver-looped fixpoint (materializes via localCheckpoint per round)
    "streaming_time_bucket",
    "streaming_sliding_window",
    "streaming_session_window",
    "streaming_dedup",
    "streaming_near_dup",
    # driver-looped iterative fixpoints: constructing the DataFrame runs
    # the bounded per-iteration collect jobs; the printed plan would only
    # show the final assignment pass
    "dedup_clusters",
    "kmeans_assign",
}


def test_no_sortmergejoin_or_cartesian_anywhere(spark):
    """Engine-wide physical invariant: NO declared batch query may plan a
    SortMergeJoin or a CartesianProduct — every join either broadcasts a
    small side or meets on a shuffled hash key (PLANS.md smj column = 0)."""
    bad = []
    for name in entrymod.queries():
        if name in _PLAN_EXEMPT:
            continue
        plan = _plan(spark, name)
        if "SortMergeJoin" in plan or "CartesianProduct" in plan:
            bad.append(name)
    assert not bad, bad


def _top_level_groups(s: str) -> list[str]:
    """Split a physical-plan argument string into its top-level
    [...]-bracket groups (bracket-depth-aware — window frame specs nest
    brackets inside the group)."""
    groups, depth, cur = [], 0, ""
    for ch in s:
        if ch == "[":
            if depth > 0:
                cur += ch
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                cur = ""
            else:
                cur += ch
        elif depth > 0:
            cur += ch
    return groups


# vocab_topk's ranking window is unpartitioned BY DESIGN but provably
# bounded: its input is the TakeOrderedAndProject(limit=top_k) output, so
# at most k rows (k=100) ever enter the single partition — the guarded
# class of bug (corpus-sized single-task windows) cannot occur. A
# dedicated test below asserts the limit really precedes the window.
_WINDOW_EXEMPT = _PLAN_EXEMPT | {"vocab_topk"}


def test_vocab_topk_window_input_is_limit_bounded(spark):
    """The unpartitioned ranking window in vocab_topk must consume the
    top-k limit's output, never the raw term table."""
    plan = _plan(spark, "vocab_topk")
    assert "TakeOrderedAndProject" in plan, plan
    window_at = plan.find("Window ")
    limit_at = plan.find("TakeOrderedAndProject")
    # Physical plans print top-down: the window node must appear ABOVE
    # (before) the limit that feeds it.
    assert 0 <= window_at < limit_at, plan


def test_no_unpartitioned_window_anywhere(spark):
    """Engine-wide physical invariant: no declared batch query may plan a
    Window with an EMPTY partition spec — ``Window.orderBy`` without
    ``partitionBy`` funnels the whole input through one task (round 2
    shipped exactly this bug in pack_sequences/ntile_quartiles; both were
    redesigned as two-phase bucketed forms in round 3, and this guard
    keeps the class of bug from regressing silently).

    Plan text: a Window node prints ``Window [funcs], [part], [order]``;
    the partition group is the one with no ASC/DESC sort direction. A
    node whose non-function groups are all sort specs (or all empty) is
    an unpartitioned window."""
    bad = []
    for name in entrymod.queries():
        if name in _WINDOW_EXEMPT:
            continue
        plan = _plan(spark, name)
        for line in plan.splitlines():
            m = re.search(r"\bWindow (\[.*)$", line.strip())
            if not m:
                continue
            spec = _top_level_groups(m.group(1))[1:]
            partitioned = any(
                g.strip() and not re.search(r"\b(ASC|DESC)\b", g)
                for g in spec
            )
            if not partitioned:
                bad.append((name, line.strip()[:120]))
    assert not bad, bad


def test_whole_stage_codegen_active(spark):
    plan = _plan(spark, "group_count_ordered")
    assert re.search(r"\*\(\d+\)", plan), plan


def test_profile_table_hll_path(spark):
    """approx_distinct=True (the 100 TB setting) runs and lands within 10%
    of exact on a 500-distinct column."""
    docs = load_table(spark, SF_ORACLE, "documents")
    prof = {
        r["column"]: r["n_distinct"]
        for r in maintenance.profile_table(docs, approx_distinct=True).collect()
    }
    assert abs(prof["doc_id"] - 500) / 500 < 0.10


def test_approx_quantiles_envelope_rank_is_partitioned(spark):
    """The exact-rank envelope inside approx_quantiles runs EAGERLY in the
    query callable, so the engine-wide unpartitioned-window sweep (which
    inspects only the RETURNED DataFrame, a literal) cannot see it. Guard
    the internal plan directly: rank the same input with global_rank as
    the query does and assert its Window is partitioned (round 5's form
    used Window.orderBy — one task for the whole fact table)."""
    from data_lakehouse_hygiene_spark.operators.ordering import global_rank
    from data_lakehouse_hygiene_spark.schemas import load_table

    li = load_table(spark, SF_ORACLE, "lineitem").select("l_extendedprice")
    ranked, n = global_rank(li, "l_extendedprice", rank_col="rn")
    assert n > 0
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line.strip())
        if not m:
            continue
        spec = _top_level_groups(m.group(1))[1:]
        assert any(
            g.strip() and not re.search(r"\b(ASC|DESC)\b", g) for g in spec
        ), line
