"""Synthesize larger scale factors from the driver's sf0.1 parquet.

The driver environment ships sf{0.001,0.01,0.1} only and /root/testdata is
read-only, so the sf1 scale rehearsal derives its data FROM the driver's
sf0.1 tables (never hand-rolled distributions): each table is replicated
``factor`` times with per-replica key remapping (stride = max_key + 1, so
replica key ranges are disjoint and every foreign key moves with its
parent), which preserves the driver data's value distributions, group
cardinalities per key, and time range while growing row counts linearly.

Content columns are perturbed per replica so similarity workloads keep a
REALISTIC pair structure instead of exploding on exact cross-replica
copies (10 identical copies of every document would turn each planted
near-dup pair into 100 pairs plus 45 self-pairs per document — a
different workload, not a bigger one):

- documents.text: replica 0 is untouched; replica i>0 re-orders each
  document's tokens by md5(token || 'r<i>') — a deterministic
  per-replica permutation. Near-duplicate documents WITHIN a replica
  share token multisets, so their permuted shingle sets stay similar
  (pair mining still finds them); the SAME document across two replicas
  is permuted differently, so cross-replica shingle overlap collapses.
  Pair counts therefore scale ~linearly with the factor.
- embeddings.embedding: replica i rotates the vector by (i*13) mod dim
  positions — norm-preserving, so within-replica cosine structure is
  exact; cross-replica cosines decorrelate to ~random.

Usage: python tools/gen_scale.py [factor] [out_dir] [tables]
Defaults: factor=10, out_dir=/root/repo/.scale/sf1 (gitignored);
``tables`` is an optional comma list (e.g. ``documents,embeddings``) for
third-decade rehearsals where only the content families are needed —
replicating 60M-row lineitem 1000x would be disk/time spent on tables
no scale-sensitive query reads.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# (table, [key columns remapped by their own table's stride]) — FK columns
# use the parent table's stride so joins keep landing.
STRIDED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FOREIGN = {
    "orders": {"o_custkey": "customer.c_custkey"},
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    stride: dict[str, int] = {}
    for t, keys in STRIDED.items():
        for k in keys:
            mx = con.execute(
                f"SELECT max({k}) FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
            stride[f"{t}.{k}"] = int(mx) + 1
    stride["events.user_id"] = (
        int(
            con.execute(
                f"SELECT max(user_id) FROM '{SRC}/events.parquet'"
            ).fetchone()[0]
        )
        + 1
    )

    for t in ("region", "nation"):
        if only is not None and t not in only:
            continue
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
        print(t, "copied")

    for t in STRIDED:
        if only is not None and t not in only:
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            own = f"{t}.{c}"
            fk = FOREIGN.get(t, {}).get(c)
            if own in stride:
                sel.append(f"{c} + i * {stride[own]} AS {c}")
            elif fk:
                sel.append(f"{c} + i * {stride[fk]} AS {c}")
            elif t == "documents" and c == "text":
                sel.append(
                    "CASE WHEN i = 0 THEN text ELSE array_to_string("
                    "list_transform(list_sort(list_transform("
                    "string_split(text, ' '), "
                    "tok -> md5(tok || 'r' || CAST(i AS VARCHAR)) || '|' ||"
                    " tok)), s -> substr(s, 34)), ' ') END AS text"
                )
            elif t == "documents" and c == "n_chars":
                # recomputed after the permutation (multi-space runs
                # collapse when tokens re-join on single spaces)
                sel.append("0 AS __n_chars_placeholder")
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "list_concat(embedding[(i*13) % len(embedding) + 1:],"
                    " embedding[1:(i*13) % len(embedding)])"
                    "::FLOAT[] AS embedding"
                )
            else:
                sel.append(c)
        inner = (
            f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet',"
            f" range({factor}) r(i)"
        )
        if t == "documents":
            inner = (
                f"SELECT doc_id, text, lang, source,"
                f" CAST(length(text) AS BIGINT) AS n_chars FROM ({inner})"
            )
        con.execute(f"COPY ({inner}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
