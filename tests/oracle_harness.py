"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL on the same parquet tables,
sorts columns by name, and compares row multisets exactly (floats compared
bit-for-bit after normalization to Python floats — the deterministic-numerics
policy in the operators is what makes exact comparison possible).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(repr(_norm(r[i])) for i in order) for r in rows),
    )


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    scols = list(spark_df.columns)
    srows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    if sorted(scols) != sorted(c.lower() for c in dcols):
        return False, f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"rowcount mismatch: spark={len(srows)} duck={len(drows)}"
    ms, md = rows_multiset(scols, srows), rows_multiset(dcols, drows)
    if ms != md:
        diff_s = [r for r in ms if r not in md][:3]
        diff_d = [r for r in md if r not in ms][:3]
        return False, f"value mismatch: spark-only={diff_s} duck-only={diff_d}"
    return True, "ok"
