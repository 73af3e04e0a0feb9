"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's capability surface (it has no text analytics —
the closest is category-label matching at
``/root/reference/elt/prescriptive/prescriptive_logic.py:106,128``) with the
operators an LLM-data pipeline needs: token counting, quality scoring,
language ID, and document fingerprinting.

Engineering rules:
- Everything is native ``pyspark.sql.functions`` column algebra — JVM-side,
  whole-stage-codegen, no Python in the hot path. At 100 TB these run at
  scan speed with zero shuffles (all per-row).
- Every derived value is deterministic and expressible in ANSI SQL so the
  DuckDB oracle can replay it bit-for-bit. Hashes are md5 hex (identical
  across engines); fractional outputs go through the floor-quantize trick
  (``aggregates.quantize``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregates import quantize

# A "BPE-ish" pre-tokenizer: letter runs, digit runs, single non-alnum marks.
# Kept RE2-compatible (no backrefs/lookahead) so Spark (Java regex) and
# DuckDB (RE2) count identically.
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Tiny deterministic stopword list drawn from the corpus vocabulary.
STOPWORDS = ("a", "the", "and", "of", "to")

# Marker words per language for the n-gram/stopword language-ID heuristic.
# Deterministic tie-break: first language in this tuple order wins.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "and", "value", "table")),
    ("de", ("der", "die", "das", "und", "nicht")),
    ("es", ("el", "la", "los", "que", "de")),
    ("fr", ("le", "la", "les", "et", "une")),
    ("zh", ("de", "shi", "bu", "le", "wo")),
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the corpus is single-space joined)."""
    return F.split(text, " ")


def project_tokens(df: DataFrame, text_col: str = "text", *keep: str) -> DataFrame:
    """(doc_id, [keep...], text, __toks) with the token split done ONCE.

    Any operator whose lambdas index the token array more than a couple of
    times must read it from this projection: Catalyst inlines a raw
    ``split(text)`` into every element reference inside a ``transform``
    lambda (CollapseProject only merges projections whose multiply-
    referenced expressions are cheap — split is not, so THIS boundary
    survives), and without it an n-gram lambda re-splits the whole text
    O(n_tokens) times per row — measured ~7× wall on the bench corpus.
    """
    return df.select(
        "doc_id", *keep, F.col(text_col), tokens(F.col(text_col)).alias("__toks")
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per document.

    Scale: pure per-row projection — no shuffle, runs at scan throughput.
    """
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(tokens(t)).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_REGEX)).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_measured"),
    )


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that appear in ``words`` (with multiplicity)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristic with a CASE
    quality bucket — the A8/A9 score-and-classify shape applied to text.
    """
    df = project_tokens(df, text_col, "n_chars")
    t = F.col(text_col)
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    # single-space joined => chars excluding separators / token count
    avg_tok_len = (n_chars - (n_tok - F.lit(1))).cast("double") / n_tok
    stop_ratio = _stopword_hits(toks, STOPWORDS).cast("double") / n_tok
    non_alnum = F.regexp_count(t, F.lit("[^a-zA-Z0-9 ]")).cast("double")
    punct_ratio = non_alnum / n_chars

    score = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(avg_tok_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(stop_ratio * F.lit(4.0), F.lit(1.0))) * F.lit(0.2)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.1)
    )
    q = quantize(score, 4)
    bucket = (
        F.when(q >= 0.75, F.lit("high"))
        .when(q >= 0.5, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return df.select(
        "doc_id",
        F.col("n_chars"),
        n_tok.alias("n_tokens"),
        quantize(avg_tok_len, 4).alias("avg_token_len"),
        quantize(stop_ratio, 4).alias("stopword_ratio"),
        quantize(punct_ratio, 4).alias("punct_ratio"),
        q.alias("quality_score"),
        bucket.alias("quality_bucket"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic).

    Per-row, shuffle-free. The argmax over language hit-counts is computed
    with a deterministic first-wins CASE ladder so ties resolve identically
    in any engine.
    """
    df = project_tokens(df, text_col)
    toks = F.col("__toks")
    hits = {lang: _stopword_hits(toks, words) for lang, words in LANG_MARKERS}
    best = F.greatest(*hits.values())
    pred = F.lit(None).cast("string")
    # Build the ladder in reverse so earlier languages take precedence.
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    sel = [F.col("doc_id")]
    sel += [hits[lang].alias(f"hits_{lang}") for lang, _ in LANG_MARKERS]
    sel.append(pred.alias("pred_lang"))
    return df.select(*sel)


def fingerprints(
    df: DataFrame,
    text_col: str = "text",
    window: int = 5,
    spread_input: bool = True,
) -> DataFrame:
    """Document fingerprinting: full-text md5 plus a rolling-window min-hash
    (winnowing-style): min over md5 of every ``window``-token shingle.

    Near-identical documents that differ by a few tokens still collide on
    the rolling fingerprint with high probability; the full md5 catches
    exact duplicates only.

    Pure per-row projection (aside from the optional batch-only ``spread``
    repartition), so it also runs on a STREAMING DataFrame with
    ``spread_input=False`` — the basis of ``streaming.near_dup_stream``.
    """
    if spread_input:
        from .cleaning import spread

        df = spread(df)
    df = project_tokens(df, text_col)
    t = F.col(text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), n - F.lit(window)),
        lambda i: F.md5(F.concat_ws(" ", *[toks[i + j] for j in range(window)])),
    )
    rolling = F.when(n >= window, F.array_min(shingle_hashes)).otherwise(F.md5(t))
    return df.select(
        "doc_id",
        F.md5(t).alias("exact_md5"),
        rolling.alias("rolling_fp"),
    )


def tfidf_top_terms(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document top-k terms by tf-idf — the classic corpus-relevance
    signal a training-data pipeline uses for keyword extraction and
    quality filtering.

    Determinism / oracle parity: idf is the RATIONAL form N/df (no
    logarithm — ln is libm-dependent and not bit-stable across engines),
    so score = (tf·N)/df is one exact integer product followed by one IEEE
    division, identical in Spark and DuckDB; quantized to 6 dp before
    ranking, ties broken by term.

    Scale shape: one explode + two hash aggregations (term frequencies per
    (doc, term), then document frequency per term — the df join lands on
    the tf groupBy's own partitioning), one window top-k per doc. N comes
    from a 1-row scalar count (the A10 literal-pushdown pattern).
    """
    from pyspark.sql.window import Window

    n_docs = df.count()
    toks = df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = (F.col("tf") * F.lit(n_docs)) / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    from .aggregates import quantize

    return (
        tf.join(dfreq, "term")
        .select("doc_id", "term", quantize(score, 6).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def chunk_documents(
    df: DataFrame, text_col: str = "text", size: int = 50, stride: int = 40
) -> DataFrame:
    """Overlapping token-window chunking — the standard preprocessing step
    that turns long documents into training/embedding-sized pieces
    (``size`` tokens per chunk, ``size - stride`` tokens of overlap).

    Pure per-row explode (no shuffle): chunk i covers tokens
    [i·stride, i·stride + size) for every start inside the document; the
    last chunks truncate. Runs at scan throughput at any scale."""
    df = project_tokens(df, text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    last = F.floor((n - F.lit(1)) / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_id"),
            F.slice(toks, i * stride + F.lit(1), size).alias("ctoks"),
        ),
    )
    ex = df.select("doc_id", F.explode(chunks).alias("c"))
    return ex.select(
        "doc_id",
        "c.chunk_id",
        F.size("c.ctoks").cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", "c.ctoks").alias("chunk_text"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1, the
    standard "repetitive document" filters in LLM data pipelines):

    - ``top_token_frac``: occurrences of the modal token / total tokens
      (catches "spam spam spam ..." degenerate pages),
    - ``dup_bigram_frac``: fraction of word bigrams that are repeats
      (catches looped boilerplate),
    - ``keep``: both below the Gopher-ish thresholds (0.20 / 0.40).

    Scale: pure in-row higher-order-function compute — O(distinct_tokens ×
    n_tokens) per document, no shuffle, scan throughput at 100 TB. The
    modal count runs in an Arrow ``mapInPandas`` kernel (hash-map counts,
    O(n) per document): the expression-tree form —
    ``array_max(transform(array_distinct, filter-count))`` — is both
    O(distinct·n) per document AND CodegenFallback-interpreted, and
    measured 12 s at sf1 where this kernel measures well under 1 s. The
    Python arithmetic replays the engine expression ops exactly (IEEE
    double division, floor-quantize to 6 decimals, same bigram join), so
    the DuckDB oracle parity is unchanged. ``keep`` names pass-through
    columns (gopher_quality's convention) so composites can chain the
    gates on one scan."""
    import math
    from collections import Counter

    import pandas as pd

    if "keep" in keep:
        raise ValueError("output column 'keep' is reserved")
    in_cols = list(dict.fromkeys(["doc_id", *keep, text_col]))
    src = df.select(*in_cols)
    types = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    out_schema = ", ".join(
        [f"doc_id {types['doc_id']}"]
        + [f"`{k}` {types[k]}" for k in keep]
        + [
            "n_tokens bigint",
            "top_token_frac double",
            "dup_bigram_frac double",
            "keep boolean",
        ]
    )

    def _row(s):
        # exact replay of the expression semantics: split keeps empties,
        # quantize = floor(x·1e6 + 0.5)/1e6 on IEEE doubles
        if s is None:
            # replay of the expression's NULL algebra: size(NULL) → NULL
            # makes n_tokens/top_frac NULL, but dup_frac's when(n >= 2)
            # predicate is NULL → falls to the otherwise(0.0) branch, and
            # keep = (NULL <= .2) AND (0.0 <= .4) → NULL (the SQL oracle
            # agrees — CASE WHEN NULL falls through to ELSE)
            return (None, None, 0.0, None)
        toks = s.split(" ")
        n = len(toks)
        top = max(Counter(toks).values())
        top_frac = math.floor(top / n * 1e6 + 0.5) / 1e6
        if n >= 2:
            bi = [toks[i] + " " + toks[i + 1] for i in range(n - 1)]
            dup_frac = (
                math.floor((len(bi) - len(set(bi))) / len(bi) * 1e6 + 0.5)
                / 1e6
            )
        else:
            dup_frac = 0.0
        return (n, top_frac, dup_frac, top_frac <= 0.2 and dup_frac <= 0.4)

    def gen(it):
        for pdf in it:
            vals = [_row(s) for s in pdf[text_col]]
            out = {"doc_id": pdf["doc_id"]}
            for k in keep:
                out[k] = pdf[k]
            out["n_tokens"] = pd.array(
                [v[0] for v in vals], dtype="Int64"
            )
            out["top_token_frac"] = [v[1] for v in vals]
            out["dup_bigram_frac"] = [v[2] for v in vals]
            out["keep"] = pd.array([v[3] for v in vals], dtype="boolean")
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, out_schema)


# RE2-compatible (no lookahead/backrefs) so Spark's Java regex and any
# RE2-based engine redact identically.
PII_EMAIL_REGEX = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_REGEX = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(
    df: DataFrame, text_col: str = "text", spread_input: bool = True
) -> DataFrame:
    """C4-style PII redaction: replace email addresses and phone-number
    shapes with typed placeholders and report per-document redaction
    counts. Pure per-row projection (regexp_replace / regexp_count on the
    JVM) — no shuffle beyond the optional ``spread`` fan-out, scan
    throughput; the order (emails first) is part of the contract since
    the phone pattern could otherwise eat digit runs inside an
    already-redacted placeholder's neighborhood.

    ``spread_input``: the five regex passes per row are the heaviest
    per-byte projection in the per-row text family, and a single-row-
    group parquet file runs them all on one core — the data-
    proportional ``spread`` fan-out measured 0.503 → 0.285 s (−43%) at
    sf0.1 (interleaved medians)."""
    if spread_input:
        from .cleaning import spread

        df = spread(df)
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(PII_EMAIL_REGEX))
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL_REGEX, "<EMAIL>"),
        PII_PHONE_REGEX,
        "<PHONE>",
    )
    n_phone = F.regexp_count(
        F.regexp_replace(t, PII_EMAIL_REGEX, "<EMAIL>"),
        F.lit(PII_PHONE_REGEX),
    )
    return df.select(
        "doc_id",
        scrubbed.alias("text"),
        n_email.cast("bigint").alias("n_emails_redacted"),
        n_phone.cast("bigint").alias("n_phones_redacted"),
    )


def pack_sequences(
    df: DataFrame, text_col: str = "text", budget: int = 2048
) -> DataFrame:
    """Sequential sequence packing: documents are laid out in doc_id order
    and assigned to training bins of ``budget`` tokens by their running
    offset (bin = floor(tokens_before / budget)).

    This is the STREAMING form of packing (a document may straddle a bin
    boundary — trainers truncate or wrap); exact first-fit packing is
    inherently sequential state, which is why production packers run
    exactly this offset formula.

    SCALE DESIGN — two-phase distributed prefix sum (no global window):
    a single ``Window.orderBy`` with no partition key funnels the whole
    corpus through one task, the canonical global-window scale-killer.
    Instead: (0) split the doc_id domain into ``n_buckets`` ordered ranges
    via approximate percentiles (balance-only — exactness not needed);
    (1) one tiny aggregate computes per-bucket token totals, whose running
    sum on the driver gives each bucket's starting offset (n_buckets rows);
    (2) the cumsum runs as a PARTITIONED window (partitionBy bucket) plus
    the bucket's literal offset. Identical output to the sequential
    formula, embarrassingly parallel; at 100 TB persist the tokenized
    projection between phases 1 and 2 to avoid a second text scan."""
    from functools import reduce
    from operator import add

    from pyspark.sql.window import Window

    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    base = df.select("doc_id", n_tok.alias("n_tok"))

    spark = df.sparkSession
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = []
    if probs:
        row = base.select(
            F.percentile_approx("doc_id", probs, 10000).alias("c")
        ).first()
        cuts = sorted(set(row["c"] or []))
    # Ordered range-bucket id: the number of cut points strictly below
    # this doc_id (a handful of codegen'd comparisons, no shuffle).
    bkt = reduce(
        add,
        [(F.col("doc_id") > F.lit(c)).cast("int") for c in cuts],
        F.lit(0),
    )
    bucketed = base.withColumn("bkt", bkt)

    totals = {
        r["bkt"]: r["t"]
        for r in bucketed.groupBy("bkt")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in range(len(cuts) + 1):
        offsets[b] = acc
        acc += totals.get(b) or 0
    off_map = F.create_map(
        *[F.lit(x) for b, o in offsets.items() for x in (b, o)]
    )

    w = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.element_at(off_map, F.col("bkt")).cast("bigint") + F.coalesce(
        F.sum("n_tok").over(w), F.lit(0).cast("bigint")
    )
    binned = bucketed.withColumn(
        "bin_id", F.floor(before / F.lit(budget)).cast("bigint")
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def bigram_lm_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality score from a corpus-trained bigram language
    model: the average conditional probability p(b|a) over the document's
    bigram instances — the distributed shape of CCNet-style perplexity
    filtering, with the LM trained on the corpus itself instead of an
    external model file.

    Determinism across engines (the whole point of the arithmetic): each
    conditional probability is one IEEE double division c2/c1 (correctly
    rounded, identical everywhere), floor-quantized to integer units of
    1e-12; the per-document accumulation then runs over exact BIGINTs and
    only the final average is divided and 6-decimal-quantized. No log —
    libm log is not bit-stable across implementations, so the score is an
    avg probability, monotone-equivalent to perplexity for filtering.

    Scale shape (2 corpus-bounded exchanges deleted in round 9): the
    exploded bigram-instance stream has two consumers — the model build
    and the scoring aggregate — and BOTH aggregate it directly, with no
    intermediate per-document count table. Map-side partial aggregation
    makes that free: each document's instances are task-local (narrow
    lineage from one input row), so the model-build exchange carries
    distinct-bigrams-per-partition (vocabulary-bounded) and the scoring
    exchange carries one partial row per document — the round-8 plan's
    (doc_id, bg) hash aggregate shuffled ~0.9 rows per bigram instance
    per consumer, the largest exchange in the text family (interleaved
    warm A/B at 1.5M docs: 18.5–24 s → 13–16 s, identical output).
    The two consumers' diverging column prunings defeat ReuseExchange,
    so the corpus scan+explode runs once per consumer — and that is the
    FAST plan: an A/B at 5k/50k/500k docs measured a
    ``localCheckpoint``-materialized intermediate consistently slower
    for single consumption, because the materialization barrier
    serializes the DAG while the redundant explode pipelines freely
    across all cores. ``ccnet_buckets`` is the exception — it
    re-consumes the whole scored output a second time, where the same
    A/B shows checkpointing a per-doc count table D winning — so the
    knob lives on ``_bigram_scored``. The corpus bigram count c2's
    a-marginal c1 rides a window PARTITIONED BY the first token over c2
    (one row per distinct bigram, so the partition is
    vocabulary-bounded — never corpus-bounded), and the finished LM
    table — tiny relative to the corpus — BROADCASTS back onto the
    instance stream (the "ship the model to every worker" pattern) for
    one per-doc weighted hash aggregate. No global windows, no
    self-joins, no driver-side model collect.
    """
    return _bigram_scored(df, text_col, carry=(), materialize=False)


def _bigram_scored(
    df: DataFrame, text_col: str, carry: tuple[str, ...],
    materialize: bool = False,
) -> DataFrame:
    """``bigram_lm_score``'s pipeline with optional pass-through columns:
    ``carry`` names doc-level columns (functionally dependent on doc_id,
    e.g. lang) threaded through the group keys — same groups, zero extra
    rows, and composites like ``ccnet_buckets`` skip a corpus-sized
    label join.

    ``materialize=True`` checkpoints the D = (doc_id, bg, cnt) table so
    lineage above it never re-executes. Only worth it when the CALLER
    multiplies the rescans — ``ccnet_buckets`` consumes the scored
    output twice, so without it the scan+explode runs 4× (measured
    36.9 s vs 24.6 s at 500k docs). For single-consumption
    (``bigram_lm_score``) the barrier is a straight loss — see that
    docstring's A/B numbers."""
    from pyspark.sql.window import Window

    df = project_tokens(df, text_col, *carry)
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(2)),
        lambda i: F.struct(
            toks[i].alias("a"), toks[i + F.lit(1)].alias("b")
        ),
    )
    safe = F.when(F.size(toks) >= 2, grams).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )
    inst = df.select("doc_id", *carry, F.explode(safe).alias("bg"))
    if materialize:
        # The per-doc count table D = (doc_id, bg, cnt) exists ONLY on
        # this branch: a checkpointable artifact smaller than the
        # instance stream, shared by both consumers below so the
        # scan+explode runs once. Deferred (lazy) checkpoint —
        # eager=True would run a full Spark job at DataFrame-
        # CONSTRUCTION time (even a bare .explain() triggered it).
        # Caveat at cluster scale: localCheckpoint blocks live on
        # executors with no lineage to recompute them, so an executor
        # loss mid-query fails the query; for a 100 TB run swap this
        # for a reliable checkpoint dir or accept the rescans.
        d = inst.groupBy("doc_id", *carry, "bg").agg(
            F.count(F.lit(1)).alias("cnt")
        ).localCheckpoint(eager=False)
        c2 = d.groupBy("bg").agg(F.sum("cnt").alias("c2"))
    else:
        # No D table: both consumers aggregate the narrow exploded
        # instance stream DIRECTLY, deleting the corpus-scale
        # (doc_id, bg) exchange the round-8 plan paid once per
        # consumer (~0.9 rows per bigram instance — the largest
        # shuffle in the whole text family). Map-side partial
        # aggregation does the same collapse for free: each doc's
        # instances are task-local (narrow lineage from one row), so
        # the c2 exchange carries distinct-bigrams-per-partition and
        # the per-doc exchange carries one partial row per doc.
        # Identical output (Σ units over instances ≡ Σ cnt·units over
        # D); interleaved warm A/B at 1.5M docs: 18.5–24 s → 13–16 s.
        c2 = inst.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = F.sum("c2").over(Window.partitionBy(F.col("bg.a")))
    units = F.floor(
        F.col("c2").cast("double") / c1.cast("double")
        * F.lit(1e12) + F.lit(0.5)
    ).cast("bigint")
    lm = c2.select("bg", units.alias("__units"))
    if materialize:
        per_doc = d.join(F.broadcast(lm), "bg").groupBy(
            "doc_id", *carry
        ).agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("__units")).alias("__su"),
        )
    else:
        per_doc = inst.join(F.broadcast(lm), "bg").groupBy(
            "doc_id", *carry
        ).agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__units").alias("__su"),
        )
    score = (
        F.col("__su").cast("double") / F.lit(1e12)
    ) / F.col("n_bigrams").cast("double")
    return per_doc.select(
        "doc_id", *carry, "n_bigrams", quantize(score, 6).alias("lm_score")
    )


# The Gopher rules' stopword list (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", appendix A1.1 quality filtering): a document must
# contain at least min_stop_hits DISTINCT words from this list.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
    keep: tuple[str, ...] = (),
    spread_input: bool = True,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1) as per-document flag
    columns plus the conjunctive ``passes`` verdict — the standard
    pre-training quality gate (word-count bounds, mean word length 3–10,
    hash/ellipsis symbol ratio, ≥80% words containing a letter, ≥2
    distinct stopwords present).

    Scale: pure per-row column algebra over one token projection — no
    shuffle beyond the optional ``spread`` fan-out, runs at scan
    throughput. All fractional values floor-quantized to 4 decimals
    BEFORE threshold comparison, so the flags are engine-portable (the
    oracle compares the same quantized value). ``keep`` names
    pass-through columns so composites (curation_funnel) can chain the
    per-row gates on ONE scan instead of joining them back
    (``text_col`` itself may be kept — the token projection already
    carries it, so it is only re-emitted, never duplicated).

    ``spread_input``: sf0.1 parquet arrives as ONE row group, so the
    scan planner cannot split it and the whole token/regex projection
    runs on one core; a data-proportional ``spread`` parallelizes it
    (interleaved A/B median 0.715 → 0.560 s at sf0.1). Composites that
    already spread (or stream) pass False.
    """
    if spread_input:
        from .cleaning import spread

        df = spread(df)
    df = project_tokens(df, text_col, *[k for k in keep if k != text_col])
    t = F.col(text_col)
    toks = F.col("__toks")
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    mean_wl = quantize(sum_len.cast("double") / n_words.cast("double"), 4)
    n_sym = F.regexp_count(t, F.lit("#")) + F.regexp_count(
        t, F.lit("\\.\\.\\.")
    )
    sym_ratio = quantize(
        n_sym.cast("double") / n_words.cast("double"), 4
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]")))
    alpha_ratio = quantize(
        n_alpha.cast("double") / n_words.cast("double"), 4
    )
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(stop_arr, lambda w: F.array_contains(toks, w))
    )
    f_wc = (n_words >= min_words) & (n_words <= max_words)
    f_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    f_sym = sym_ratio <= max_symbol_word_ratio
    f_alpha = alpha_ratio >= min_alpha_word_ratio
    f_stop = stop_hits >= min_stop_hits
    return df.select(
        "doc_id",
        *keep,
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        f_wc.alias("flag_word_count"),
        f_wl.alias("flag_mean_word_len"),
        f_sym.alias("flag_symbol_ratio"),
        f_alpha.alias("flag_alpha_ratio"),
        f_stop.alias("flag_stopwords"),
        (f_wc & f_wl & f_sym & f_alpha & f_stop).alias("passes"),
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Corpus vocabulary head: the ``top_k`` most frequent tokens with
    rank, corpus share, and cumulative share — the Zipf-head report a
    tokenizer-budget / data-mixture analysis starts from. (No log-log
    slope on purpose: libm ``log`` is not bit-stable across engines; rank
    and share carry the same signal and are exact-integer + one correctly
    rounded division each.)

    Scale shape: explode → map-side-combined hash aggregate to the term
    grain (vocabulary-bounded); the corpus total is a 1-row rollup of that
    SAME term table (never a second corpus scan) broadcast back onto the
    head. The top-k selection is TakeOrderedAndProject (never a full sort), and
    only the ≤ top_k survivors pass through the single-partition ranking
    window — bounded by ``top_k``, not by the vocabulary.
    """
    from pyspark.sql.window import Window as W

    from .cleaning import spread

    tf = (
        spread(df)
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = tf.agg(F.sum("freq").alias("__total"))
    top = (
        tf.orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = W.orderBy(F.col("freq").desc(), F.col("token").asc())
    ranked = top.select(
        F.row_number().over(w).alias("rank"),
        "token",
        "freq",
        quantize(
            F.col("freq").cast("double") / F.col("__total").cast("double"), 6
        ).alias("share"),
        quantize(
            F.sum("freq").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ).cast("double")
            / F.col("__total").cast("double"),
            6,
        ).alias("cum_share"),
    )
    return ranked


def ccnet_buckets(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text",
    materialize: bool = False,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al. 2020):
    score every document with the corpus-trained bigram LM
    (``bigram_lm_score`` — avg conditional probability, monotone in
    perplexity), then label each document head / middle / tail by its
    language-relative tercile. CCNet keeps "head" as the high-quality cut.

    Scale shape — NO per-language global sort: the tercile election runs
    on the (lang, lm_score) DISTINCT-VALUE distribution, which is
    VALUE-bounded (lm_score is 6-decimal-quantized into [0,1], so ≤ 1e6+1
    rows per language regardless of corpus size), never corpus-bounded.
    cum_better = count of strictly-better-scored docs in the language (a
    windowed prefix sum over the distinct-value table); a document lands
    in head if 3·cum_better < n_lang, middle if < 2·n_lang, else tail —
    tie groups share cum_better, so equal scores always share a bucket
    (deterministic, engine-portable). The finished (lang, score → bucket)
    table broadcasts back onto the scored corpus.
    """
    from pyspark.sql.window import Window as W

    # lang rides the LM aggregates as an extra group key (functionally
    # dependent on doc_id — same groups, zero extra rows), which deletes
    # the corpus-sized scored⋈lang join the round-6 plan paid twice (once
    # per consumer of the labeled corpus). The labeled output has two
    # consumers (the tercile election and the final join); it is one
    # narrow row per doc, so ITS checkpoint is cheap and deletes a whole
    # LM re-execution — that barrier is unconditional. The D-table
    # checkpoint (materialize=True) became a LOSS once the no-D
    # direct-instance aggregation landed: with the labeled barrier in
    # place the LM pipeline runs exactly once either way, so D's
    # write+read + its (doc_id, bg) exchange buys nothing the deleted
    # exchange didn't already pay for (500k-doc interleaved A/B:
    # D-checkpoint 19.5–28.7 s median ~22, no-D 13.0–19.9 s median
    # ~17.4; earlier rounds' "checkpoint wins" A/Bs predate the no-D
    # shape). Kept as a caller knob for corpora where the scan itself —
    # not the exchange — dominates and a shared D beats two scans.
    labeled = (
        _bigram_scored(df, text_col, carry=(lang_col,), materialize=materialize)
        .withColumnRenamed(lang_col, "lang")
        .localCheckpoint(eager=False)
    )
    # One exchange for the whole tercile election: hash-partitioning on
    # lang alone satisfies BOTH the (lang, lm_score) groupBy's clustered
    # distribution (lang ⊆ grouping keys ⇒ equal keys co-locate) and the
    # lang-partitioned windows below — without it the plan pays
    # exchange(lang, lm_score) + exchange(lang) back to back.
    dist = (
        labeled.repartition("lang")
        .groupBy("lang", "lm_score")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_prev = (
        W.partitionBy("lang")
        .orderBy(F.col("lm_score").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_lang = W.partitionBy("lang")
    cum = F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)).cast("bigint")
    n_lang = F.sum("cnt").over(w_lang).cast("bigint")
    buckets = dist.select(
        "lang",
        "lm_score",
        F.when(cum * 3 < n_lang, F.lit("head"))
        .when(cum * 3 < n_lang * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )
    return labeled.join(
        F.broadcast(buckets), ["lang", "lm_score"]
    ).select("doc_id", "lang", "lm_score", "ppl_bucket")


# Unicode mess folded by normalize_text: exotic spaces and typographic
# punctuation to their ASCII equivalents, zero-widths/BOM dropped. Literal
# replacements (never regex character classes) so the identical table
# replays byte-for-byte through any engine's replace(); order within the
# table is irrelevant (sources are disjoint single codepoints), but the
# whole table must run BEFORE whitespace collapse so folded NBSPs join
# adjacent space runs.
UNICODE_FOLDS: tuple[tuple[str, str], ...] = (
    (" ", " "),            # no-break space
    (" ", " "),            # en space
    (" ", " "),            # em space
    (" ", " "),            # thin space
    ("​", ""),             # zero-width space
    ("‌", ""),             # zero-width non-joiner
    ("‍", ""),             # zero-width joiner
    ("﻿", ""),             # BOM / zero-width no-break
    ("‘", "'"),            # left single curly quote
    ("’", "'"),            # right single curly quote
    ("“", '"'),            # left double curly quote
    ("”", '"'),            # right double curly quote
    ("–", "-"),            # en dash
    ("—", "-"),            # em dash
    ("…", "..."),          # horizontal ellipsis
)

# C0 control characters minus \t \n \r (those are whitespace, handled by
# the collapse), plus DEL. RE2-compatible hex-escape class — replays in
# both Java regex and DuckDB RE2.
CONTROL_CHARS_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-dedup text normalization — the canonical first transform of a
    crawl→training-text pipeline (CCNet/RefinedWeb both normalize before
    hashing): fold typographic Unicode (curly quotes, dashes, ellipsis,
    exotic spaces) to ASCII, drop zero-widths and C0/DEL control
    characters, collapse whitespace runs, trim. Returns
    (doc_id, norm_text, n_chars_raw, n_chars_norm) — the length delta is
    the cheap "how dirty was this source" signal a pipeline aggregates
    per source before deciding what to recrawl.

    Without this step, exact/near-dup hashing misses byte-level variants
    of the same page (NBSP vs space, curly vs straight quotes are
    different shingles), deflating dedup recall corpus-wide.

    Scale shape: ZERO shuffles — a fixed chain of literal replaces plus
    two regexp passes, whole-stage-codegen per-row work at scan speed.
    Every fold is a single-codepoint literal replace that replays
    identically in the DuckDB oracle; no locale-dependent case mapping,
    no libicu normalization forms (NFC/NFKC are a codec-class dependency
    deliberately out of contract — the fold table is the deterministic,
    engine-portable subset).
    """
    t = F.col(text_col)
    n_raw = F.length(t).cast("bigint")
    for src, dst in UNICODE_FOLDS:
        t = F.replace(t, F.lit(src), F.lit(dst))
    t = F.regexp_replace(t, CONTROL_CHARS_RE, "")
    t = F.trim(F.regexp_replace(t, "[ \\t\\r\\n]+", " "))
    return df.select(
        "doc_id",
        t.alias("norm_text"),
        n_raw.alias("n_chars_raw"),
        F.length(t).cast("bigint").alias("n_chars_norm"),
    )


# HTML entities decoded by strip_html, applied IN ORDER: &amp; must decode
# LAST or "&amp;lt;" would double-decode to "<" (the standard single-pass
# pitfall); the oracle replays the same sequence.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_html(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Crawl-page cleanup: remove HTML tags, decode the common entities,
    collapse whitespace — the first transform a crawl→training-text
    pipeline applies. Returns (doc_id, clean_text, n_tags_removed).

    Tag removal is the pragmatic ``<[^>]*>`` regex (markup REMOVAL, not an
    HTML parser — script/style CONTENT survives; a DOM-aware extractor is
    a codec-class dependency this environment lacks). Entities decode in
    the documented order. Pure per-row regex/replace column algebra —
    shuffle-free, scan-speed, and every step replays identically in the
    DuckDB oracle (RE2-compatible pattern, no backrefs).
    """
    t = F.col(text_col)
    n_tags = F.regexp_count(t, F.lit("<[^>]*>")).cast("bigint")
    cleaned = F.regexp_replace(t, "<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(ch))
    collapsed = F.trim(F.regexp_replace(cleaned, "[ \\t\\r\\n]+", " "))
    return df.select(
        "doc_id",
        collapsed.alias("clean_text"),
        n_tags.alias("n_tags_removed"),
    )


# Fixed counting alphabet for char_stats: the per-class counts come from
# length-difference (one replace() per class), so the class set must be
# finite and known up front. Characters outside it fold into one "other"
# class — for diversity purposes that UNDER-counts other-heavy documents'
# diversity, which is the conservative direction for a gibberish filter.
CHAR_CLASSES = tuple("abcdefghijklmnopqrstuvwxyz0123456789")


def char_stats(
    df: DataFrame, text_col: str = "text", spread_input: bool = True
) -> DataFrame:
    """Per-document character-distribution statistics for encoding- and
    gibberish-detection: class counts (letters/digits/spaces/other),
    distinct-character richness, and the Simpson diversity index
    ``1 - Σ p_c²`` over per-character classes.

    Simpson instead of Shannon entropy BY DESIGN: entropy needs libm
    ``log``, which is not bit-stable across engines (the same rule the
    bigram LM follows); Simpson is Σ of exact BIGINT squares and ONE
    correctly-rounded double division — bit-identical in any engine —
    and is monotone-comparable for the filtering use (mono-character
    spam → 0, uniform text → high).

    Scale shape: ZERO shuffles. Every class count is
    ``length(text) - length(replace(text, c, ''))`` — per-row string
    passes that whole-stage codegen compiles, ~37 scans of each string
    per row. That beats the explode-chars alternative by construction:
    exploding 100 TB of text into per-character rows shuffles 10¹⁴ rows;
    this streams at scan speed with no exchange at all. The counts
    materialize in their own projection (multiply-referenced non-cheap
    expressions — CollapseProject keeps the boundary, same rule as
    ``project_tokens``).

    Both projections are GENERATED SQL parsed by selectExpr, not Column
    algebra: building 37 count columns plus their class sums from Column
    calls costs hundreds of py4j round-trips (~2.8 s of driver-side
    DataFrame construction per call, data-size-independent — the
    ``_swar_bits_sql`` pathology); ~45 parsed strings are each a single
    round-trip.

    ``spread_input`` (round 14): ~37 string passes per row on a single-
    row-group parquet input all run on one core — the data-proportional
    ``spread`` fan-out measured 0.833 → 0.539 s (−35%) at sf0.1
    (interleaved medians).
    """
    if spread_input:
        from .cleaning import spread

        df = spread(df)
    ident = "`" + text_col.replace("`", "``") + "`"
    counts = df.selectExpr(
        "doc_id",
        f"cast(length({ident}) as bigint) AS __n",
        f"cast(length({ident}) - length(replace({ident}, ' ', ''))"
        " as bigint) AS __c_sp",
        *[
            f"cast(length({ident}) - length(replace({ident}, '{c}', ''))"
            f" as bigint) AS __c_{c}"
            for c in CHAR_CLASSES
        ],
    )
    letters = " + ".join(f"__c_{c}" for c in CHAR_CLASSES[:26])
    digits = " + ".join(f"__c_{c}" for c in CHAR_CLASSES[26:])
    oth = f"(__n - ({letters}) - ({digits}) - __c_sp)"
    distinct_known = " + ".join(
        f"(CASE WHEN __c_{c} > 0 THEN 1 ELSE 0 END)" for c in CHAR_CLASSES
    ) + " + (CASE WHEN __c_sp > 0 THEN 1 ELSE 0 END)"
    sumsq = (
        " + ".join(f"__c_{c}*__c_{c}" for c in CHAR_CLASSES)
        + f" + __c_sp*__c_sp + {oth}*{oth}"
    )
    return counts.selectExpr(
        "doc_id",
        "__n AS n_chars",
        f"({letters}) AS n_letters",
        f"({digits}) AS n_digits",
        "__c_sp AS n_spaces",
        f"{oth} AS n_other",
        f"cast({distinct_known} as bigint) AS n_distinct_chars",
        # D-suffixed literals: the SQL parser types bare 1.0 as DECIMAL
        # (unlike F.lit), which would drag the whole chain into decimal
        # arithmetic and break double parity with the oracle.
        f"CASE WHEN __n > 0 THEN "
        f"floor((1.0D - cast({sumsq} as double) / cast(__n*__n as double))"
        f" * 1000000.0D + 0.5D) / 1000000.0D END AS char_simpson",
    )


# Keyword markers for the code-vs-prose router. Matched as whole tokens
# (split on space), never substrings — 'for' inside 'forest' is not a hit.
CODE_KEYWORDS = (
    "def", "return", "if", "else", "for", "while", "class", "import",
    "function", "var", "const", "null", "void", "int", "struct",
)

# Symbol class for code detection; RE2-compatible (no backrefs), '-' last
# so the character class parses identically in Java regex and RE2.
CODE_SYMBOL_RE = "[{}\\[\\]()<>=;:!&|^~#@+*/%-]"


def code_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Code-vs-prose routing signals — the mixture split an LLM data
    pipeline applies before language-specific processing (code gets a
    different tokenizer/quality stack than prose).

    Features are deterministic column algebra: symbol density (brackets/
    operators per char), code-keyword token hits, digit density, and a
    threshold CASE router. Shuffle-free per-row compute at scan speed;
    every expression replays in ANSI SQL (counts are exact integers,
    ratios one double division + floor-quantize).
    """
    df = project_tokens(df, text_col)
    t = F.col(text_col)
    toks = F.col("__toks")
    n_chars = F.length(t).cast("bigint")
    n_tok = F.size(toks)
    n_sym = F.regexp_count(t, F.lit(CODE_SYMBOL_RE)).cast("bigint")
    n_kw = _stopword_hits(toks, CODE_KEYWORDS).cast("bigint")
    n_digit = F.regexp_count(t, F.lit("[0-9]")).cast("bigint")
    sym_ratio = F.when(
        n_chars > 0, quantize(n_sym.cast("double") / n_chars, 4)
    )
    kw_ratio = F.when(n_tok > 0, quantize(n_kw.cast("double") / n_tok, 4))
    digit_ratio = F.when(
        n_chars > 0, quantize(n_digit.cast("double") / n_chars, 4)
    )
    is_code = (
        F.when(
            (F.coalesce(sym_ratio, F.lit(0.0)) > 0.03)
            | (F.coalesce(kw_ratio, F.lit(0.0)) > 0.05),
            F.lit("code"),
        )
        .otherwise(F.lit("prose"))
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_sym.alias("n_symbols"),
        n_kw.alias("n_keywords"),
        n_digit.alias("n_digit_chars"),
        sym_ratio.alias("symbol_ratio"),
        kw_ratio.alias("keyword_ratio"),
        digit_ratio.alias("digit_ratio"),
        is_code.alias("doc_class"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 20,
) -> DataFrame:
    """Corpus-level boilerplate mining: word n-grams that appear in at
    least ``min_docs`` DISTINCT documents, with document frequency and
    total occurrence counts — the discovery pass that feeds template/
    banner removal (C4 and RefinedWeb both strip high-document-frequency
    lines and phrases before dedup).

    Scale shape: one corpus scan → explode n-gram INSTANCES → one
    map-side-combined hash aggregate keyed on (shingle, doc_id) → one
    aggregate keyed on shingle, filtered by the doc-frequency threshold
    BEFORE anything corpus-sized is sorted or collected. The result is
    vocabulary-bounded (shingles above a real threshold are a tiny tail
    of the shingle distribution), so the final ordering sorts a small
    relation. No joins, no windows; at 100 TB this is two partial-agg
    shuffles of shrinking size.
    """
    # n-gram INSTANCES (multiplicity preserved — unlike dedup's
    # shingle_rows, which array_distincts per doc, occurrence totals need
    # every instance). Same split-once projection-boundary discipline.
    elems = ", ".join(f"__toks[i + {j}]" for j in range(n))
    sh = F.expr(
        f"if(size(__toks) >= {n}, "
        f"transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', {elems})), array())"
    )
    inst = project_tokens(df, text_col).select(
        "doc_id", F.explode(sh).alias("shingle")
    )
    per_doc = inst.groupBy("shingle", "doc_id").agg(
        F.count(F.lit(1)).alias("n_in_doc")
    )
    return (
        per_doc.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_in_doc").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "shingle")
    )


# Above this vocabulary size the in-row map-literal encode would bloat
# the plan / codegen; the broadcast-join + reassembly plan takes over.
VOCAB_INLINE_MAX = 4096


def vocab_encode(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    unk_id: int = -1,
) -> DataFrame:
    """Tokenize-and-encode — the step that turns a curated corpus into
    model input: build the top-``vocab_size`` corpus vocabulary (ids
    0..V-1 in frequency-desc / token-asc order, ``vocab_topk``'s exact
    ranking) and re-emit every document as its token-id array, with
    out-of-vocabulary tokens mapped to ``unk_id``.

    Returns (doc_id, ids array<int>, n_tokens, n_unk): the id sequence
    preserves token order, and the OOV count is the coverage diagnostic
    a tokenizer budget is tuned against.

    Scale shape — TWO value-identical encode plans (tested equal),
    gated on ``vocab_size``:

    - ``vocab_size ≤ VOCAB_INLINE_MAX``: the finished vocab (≤ V rows,
      bounded driver traffic by the caller's own parameter) ships as a
      MAP LITERAL in the plan and the encode is a pure in-row
      ``transform`` over the token array — ZERO corpus shuffles, no
      explode, no reassembly; scan speed at any corpus size. The sf10
      rehearsal measured WHY: the join+reassembly plan paid 19.4 s at
      500k docs, entirely in the corpus-sized (pos, id) regroup; the
      in-row plan deletes that exchange.
    - larger vocabularies (map literals would bloat the plan/codegen):
      the vocab BROADCASTS onto the positional token stream
      (ship-the-model — the corpus never shuffles to meet the vocab)
      and the one corpus-sized shuffle is the per-document reassembly
      groupBy; order is restored by ``array_sort`` over (pos, id)
      structs, not by any cross-partition ordering assumption
      (collect_list order is undefined by contract).

    Both plans build the vocab the same way: one explode feeds the
    term-grain aggregate (vocabulary-bounded output), the top-V cut is
    TakeOrderedAndProject (never a full sort — only ≤ V survivors pass
    the single-partition id-assignment window).
    """
    from pyspark.sql.window import Window as W

    from .cleaning import spread

    base = project_tokens(spread(df), text_col)
    tf = (
        base.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = W.orderBy(F.col("freq").desc(), F.col("token").asc())
    vocab = (
        tf.orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select(
            "token",
            (F.row_number().over(w) - F.lit(1)).cast("int").alias("__vid"),
        )
    )
    if vocab_size <= VOCAB_INLINE_MAX:
        rows = vocab.collect()  # ≤ vocab_size rows — caller-bounded
        unk = F.lit(int(unk_id)).cast("int")
        toks = F.col("__toks")
        if rows:
            entries = []
            for r in rows:
                entries.append(F.lit(r["token"]))
                entries.append(F.lit(int(r["__vid"])).cast("int"))
            mp = F.create_map(*entries)
            # n_unk counts lookup MISSES (null before the unk coalesce),
            # so a caller-chosen unk_id colliding with a real id cannot
            # inflate the count
            raw = F.transform(toks, lambda t: F.element_at(mp, t))
        else:  # empty corpus vocab: everything is UNK
            raw = F.transform(toks, lambda t: F.lit(None).cast("int"))
        ids = F.transform(raw, lambda x: F.coalesce(x, unk))
        return base.select(
            "doc_id",
            ids.alias("ids"),
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.size(F.filter(raw, lambda x: x.isNull()))
            .cast("bigint")
            .alias("n_unk"),
        )
    pos = base.select(
        "doc_id", F.posexplode("__toks").alias("pos", "token")
    )
    enc = pos.join(F.broadcast(vocab), "token", "left")
    return (
        enc.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            F.coalesce(
                                F.col("__vid"), F.lit(int(unk_id)).cast("int")
                            ).alias("id"),
                        )
                    )
                ),
                lambda s: s["id"],
            ).alias("ids"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("__vid").isNull().cast("bigint")).alias("n_unk"),
        )
        .select("doc_id", "ids", "n_tokens", "n_unk")
    )


def ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 3, min_count: int = 2
) -> DataFrame:
    """Pruned corpus n-gram frequency table — the raw-count primitive an
    n-gram LM / contamination index / boilerplate miner is built from
    (counts every OCCURRENCE, unlike ``boilerplate_ngrams`` which counts
    per-document presence). Documents shorter than ``n`` tokens contribute
    nothing (standard LM-count convention). Returns ``(ngram, cnt)`` with
    ``cnt >= min_count``.

    Scale shape: positional n-gram construction is an in-row transform
    over the ONCE-split token array (``project_tokens`` pins the split
    behind a projection boundary), then ONE map-side-combined hash
    aggregate to the n-gram grain. The explode is wide (≈ one row per
    corpus token) but never shuffles at that grain: partial aggregation
    collapses each partition to its distinct-ngram table before the
    exchange, so the shuffle carries vocabulary-bounded partials, not
    10¹⁴ token rows. The ``min_count`` prune runs post-aggregate (a
    count cannot be pruned before it exists) but pre-materialization, so
    the singleton tail — the vast majority of distinct n-grams by
    Zipf — never reaches the consumer.
    """
    from .cleaning import spread

    elems = ", ".join(f"__toks[i + {j}]" for j in range(n))
    grams = F.expr(
        f"if(size(__toks) >= {n}, "
        f"transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', {elems})), "
        f"array())"
    )
    return (
        spread(project_tokens(df, text_col))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= int(min_count))
    )


def cooccurrence_counts(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Corpus within-window token co-occurrence counts — the primitive
    under word2vec/GloVe-style embedding training and PMI collocation
    mining: for every token position i, count each unordered pair
    {tok[i], tok[j]} with i < j ≤ i+window, summed over the corpus.
    Returns ``(tok_a, tok_b, cnt)`` with ``tok_a <= tok_b``
    (lexicographic member order makes the pair key deterministic and
    engine-portable) and ``cnt >= min_count``.

    Scale shape — same as ``ngram_counts``, one map-side-combined hash
    aggregate: the pair list is built IN-ROW over the once-split token
    array (~``window`` structs per corpus token), the explode is narrow
    (no exchange), and partial aggregation collapses each partition to
    its distinct-pair table before the one shuffle — so the exchange
    carries pair-vocabulary partials, never the 10¹⁴-row token stream.
    Zipf's singleton tail dies at the ``min_count`` filter
    post-aggregate, pre-materialization. No self-join on positions: the
    positional join a word2vec data-prep usually writes (tokens ⋈
    tokens ON |i−j| ≤ w) is quadratic-prone and shuffles twice; in-row
    generation is one narrow pass.
    """
    from .cleaning import spread

    w = int(window)
    pairs = F.expr(
        "if(size(__toks) >= 2, "
        "flatten(transform(sequence(0, size(__toks) - 2), i -> "
        f"transform(sequence(i + 1, least(i + {w}, size(__toks) - 1)), "
        "j -> struct(least(__toks[i], __toks[j]) AS tok_a, "
        "greatest(__toks[i], __toks[j]) AS tok_b)))), "
        "array())"
    )
    return (
        spread(project_tokens(df, text_col))
        .select(F.explode(pairs).alias("p"))
        .groupBy("p.tok_a", "p.tok_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= int(min_count))
    )


def collocation_lift(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    min_lift: float = 2.0,
) -> DataFrame:
    """Collocation mining on top of ``cooccurrence_counts``: score each
    co-occurring pair by LIFT = p(a,b) / (p(a)·p(b)) — computed as
    (cnt_ab·N) / (cnt_a·cnt_b) over corpus unigram counts — and keep
    pairs with ``lift >= min_lift``. Lift is strictly monotone in PMI
    (PMI = log lift) without the libm ``log`` this engine bans for
    cross-engine bit-parity; the phrase-induction use (word2vec phrase
    merging, tokenizer multi-word vocab candidates) only ranks, so the
    monotone surrogate carries the full signal. Returns
    (tok_a, tok_b, cnt_ab, lift) with lift 6-decimal floor-quantized.

    N is the corpus TOKEN count (unigram normalization); a pair can
    co-occur with up to ``window`` partners per position, so lift here
    is calibrated per-window-slot — consistent across the corpus, which
    is all ranking needs.

    Scale shape: the pair table comes from ``cooccurrence_counts`` (one
    map-side-combined aggregate); the unigram table is
    vocabulary-bounded and BROADCASTS onto the pair table twice (tok_a,
    tok_b legs); N is a 1-row aggregate of the unigram table (never a
    second corpus scan) attached by broadcast cross join. All arithmetic
    is exact BIGINT counts plus one double expression evaluated with the
    identical tree in the oracle.
    """
    from .cleaning import spread

    co = cooccurrence_counts(df, text_col, window, min_count)
    uni = (
        spread(df)
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("ucnt"))
    )
    total = uni.agg(F.sum("ucnt").alias("__n"))
    lift = (
        F.col("cnt").cast("double") * F.col("__n").cast("double")
    ) / (
        F.col("__ua").cast("double") * F.col("__ub").cast("double")
    )
    return (
        co.join(
            F.broadcast(uni.select(F.col("token").alias("tok_a"),
                                   F.col("ucnt").alias("__ua"))),
            "tok_a",
        )
        .join(
            F.broadcast(uni.select(F.col("token").alias("tok_b"),
                                   F.col("ucnt").alias("__ub"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "tok_a", "tok_b", F.col("cnt").alias("cnt_ab"),
            quantize(lift, 6).alias("lift"),
        )
        .where(F.col("lift") >= float(min_lift))
    )


def _bpe_merge_word(word: str, ranks: dict) -> tuple:
    """Reference BPE apply for one word: repeatedly merge the
    lowest-rank adjacent symbol pair (all its occurrences, leftmost
    first) until no learnable pair remains. Pure function of
    (word, ranks) — shared by the trainer's bookkeeping and the
    encoder kernel so train/encode can never drift."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best is None or r < best[0]):
                best = (r, a, b)
        if best is None:
            break
        _, a, b = best
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return tuple(syms)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_types: int = 50_000,
) -> DataFrame:
    """Learn a BPE merge table from the corpus (Sennrich et al. 2016,
    without the end-of-word marker): returns ``(rank, left, right,
    pair_count)`` — ``rank`` is merge order (0 = first), ``pair_count``
    the frequency mass the pair had when elected.

    Scale shape — the corpus is touched ONCE, distributed: a map-side-
    combined aggregate to the word-TYPE grain (Heaps-law sublinear in
    corpus size), capped to the ``max_types`` most frequent types
    (freq desc, word asc — deterministic; frequency-capped type tables
    are how production tokenizer trainers bound memory, and the dropped
    tail holds negligible pair mass by Zipf). The merge election loop
    then runs driver-side over that BOUNDED table — ≤ ``max_types``
    rows collected, corpus-size-independent — because each merge
    depends on the previous one (inherently sequential; distributing it
    would be ``n_merges`` full jobs for work a single core finishes in
    seconds on a capped table). Election tie-break: (count desc, left
    asc, right asc), engine-portable.
    """
    from .cleaning import spread

    cap = (
        spread(df)
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w").asc())
        .limit(int(max_types))
    )
    types = [(r["w"], int(r["freq"])) for r in cap.collect()]
    word_syms = {w: tuple(w) for w, _ in types}
    merges = []
    for rank in range(int(n_merges)):
        counts: dict = {}
        for w, freq in types:
            syms = word_syms[w]
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        merged = left + right
        for w in word_syms:
            syms = word_syms[w]
            if left not in syms or right not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            word_syms[w] = tuple(out)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Apply a learned BPE merge table to the corpus: returns
    ``(doc_id, bpe_tokens array<string>, n_bpe_tokens)``.

    Scale shape: the merge table is ≤ ``n_merges`` rows — collected once
    on the driver (bounded by construction) and shipped to every task in
    the kernel's closure, never joined. The apply itself is an Arrow
    ``mapInPandas`` kernel (merge application is an inherently iterative
    per-word loop — no leftmost-greedy-correct expression form exists in
    portable column algebra; a chained ``replace`` mis-merges across
    symbol boundaries, and a fold-per-merge is CodegenFallback-
    interpreted at the same cost with none of the clarity): per batch a
    word→tokens memo collapses the Zipf head, so each distinct word in a
    batch pays the merge loop once regardless of its token frequency.
    Shuffle-free; scan throughput at 100 TB.
    """
    import pandas as pd

    ranks = {
        (r["left"], r["right"]): int(r["rank"]) for r in merges.collect()
    }

    def gen(it):
        memo: dict = {}
        for pdf in it:
            toks_out, counts = [], []
            for s in pdf[text_col]:
                if s is None:
                    toks_out.append(None)
                    counts.append(None)
                    continue
                enc = []
                for w in s.split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = _bpe_merge_word(w, ranks)
                        memo[w] = got
                    enc.extend(got)
                toks_out.append(enc)
                counts.append(len(enc))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bpe_tokens": toks_out,
                    "n_bpe_tokens": pd.array(counts, dtype="Int64"),
                }
            )

    return df.select("doc_id", text_col).mapInPandas(
        gen, "doc_id bigint, bpe_tokens array<string>, n_bpe_tokens bigint"
    )
