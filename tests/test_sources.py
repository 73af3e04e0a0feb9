"""Source readers S1/S2/S6 (SURVEY.md §2.1): declared-schema CSV with
malformed-row dropping, JSON payload parsing with nested explode."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

import json

import pytest

from data_lakehouse_hygiene_spark.sources import (
    dataframe_from_payload,
    fetch_json,
    read_csv,
    read_csv_sniffed,
    sniff_csv_delimiter,
)


def test_read_csv_drops_malformed(spark):
    """DROPMALFORMED ≡ the reference's on_bad_lines='skip'
    (sheets_to_raw.py:49); BOM handled natively."""
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "in.csv"
        p.write_text(
            "﻿id,name,score\n"
            "1,alpha,2.5\n"
            "notanint,beta,1.0\n"   # malformed id -> dropped
            "3,gamma,oops\n"        # malformed score -> dropped
            "4,delta,4.0\n"
        )
        df = read_csv(spark, str(p), schema)
        rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
        assert rows == {1: ("alpha", 2.5), 4: ("delta", 4.0)}


def test_fetch_json_guardrails():
    """S1 fetch semantics from bmkg_to_raw.py:43-46 / clean_aqicn.py:56-57:
    raise on non-2xx, validate the payload's embedded status field, pass
    the timeout through to the transport."""
    calls = {}

    def fake(url, timeout):
        calls["url"], calls["timeout"] = url, timeout
        return 200, json.dumps({"status": "ok", "v": 7}).encode()

    out = fetch_json("http://x/api", transport=fake, status_field="status")
    assert out["v"] == 7 and calls == {"url": "http://x/api", "timeout": 30}

    with pytest.raises(RuntimeError, match="HTTP 503"):
        fetch_json("http://x", transport=lambda u, t: (503, b"{}"))

    with pytest.raises(ValueError, match="status"):
        fetch_json(
            "http://x",
            transport=lambda u, t: (200, json.dumps({"status": "error"}).encode()),
            status_field="status",
        )


def test_fetch_json_error_paths():
    """Recorded-payload failure fixtures (VERDICT r2 §Missing 3): the
    hardening behaviors of clean_aqicn.py:56-57 / bmkg_to_raw.py:43-46 —
    a hung fetch surfaces as the transport's timeout error, a 2xx body
    that isn't JSON fails parsing, and a missing status field is treated
    as not-ok."""

    def timing_out(url, timeout):
        raise TimeoutError(f"no response within {timeout}s")

    with pytest.raises(TimeoutError, match="no response"):
        fetch_json("http://x/slow", transport=timing_out, timeout=3)

    with pytest.raises(json.JSONDecodeError):
        fetch_json(
            "http://x", transport=lambda u, t: (200, b"<html>gateway error")
        )

    with pytest.raises(ValueError, match="status=None"):
        fetch_json(
            "http://x",
            transport=lambda u, t: (200, json.dumps({"v": 1}).encode()),
            status_field="status",
        )


def test_read_csv_sniffed_directory_and_bom(spark):
    """The sniff sample is read through the distributed reader, so the
    same path shapes the CSV scan accepts (directories, BOM'd files)
    work for sniffing too (ADVICE r2)."""
    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "part-0.csv"
        p.write_bytes("id;name\n1;alpha\n2;beta\n".encode("utf-8-sig"))
        rows = {
            r["id"]: r["name"]
            for r in read_csv_sniffed(spark, d, schema).collect()
        }
        assert rows == {1: "alpha", 2: "beta"}


def test_sniff_csv_delimiter():
    assert sniff_csv_delimiter("a,b,c\n1,2,3\n") == ","
    assert sniff_csv_delimiter("a;b;c\n1;2;3\n") == ";"
    with pytest.raises(ValueError, match="<=1 column"):
        sniff_csv_delimiter("just a sentence of words\nanother line\n")


def test_read_csv_sniffed_semicolon(spark):
    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "semi.csv"
        p.write_text("id;name\n1;alpha\n2;beta\n")
        rows = {
            r["id"]: r["name"]
            for r in read_csv_sniffed(spark, str(p), schema).collect()
        }
        assert rows == {1: "alpha", 2: "beta"}


def test_dataframe_from_payload_nested_explode(spark):
    """S1: BMKG-shaped triple-nested payload -> declared schema -> double
    explode -> flat rows (clean_bmkg.py:59-69 as Catalyst expressions)."""
    payload = {
        "lokasi": "kota",
        "data": [
            {
                "cuaca": [
                    [
                        {"t": 30.0, "hu": 70.0, "desc": "cerah"},
                        {"t": 29.0, "hu": 75.0, "desc": "berawan"},
                    ],
                    [{"t": 27.5, "hu": 80.0, "desc": "hujan"}],
                ]
            }
        ],
    }
    rec = StructType(
        [
            StructField("t", DoubleType()),
            StructField("hu", DoubleType()),
            StructField("desc", StringType()),
        ]
    )
    schema = StructType(
        [
            StructField("lokasi", StringType()),
            StructField(
                "data",
                ArrayType(
                    StructType(
                        [StructField("cuaca", ArrayType(ArrayType(rec)))]
                    )
                ),
            ),
        ]
    )
    df = dataframe_from_payload(spark, payload, schema)
    flat = (
        df.select("lokasi", F.explode("data").alias("d"))
        .select("lokasi", F.explode("d.cuaca").alias("day"))
        .select("lokasi", F.explode("day").alias("r"))
        .select("lokasi", "r.t", "r.hu", "r.desc")
    )
    rows = sorted(tuple(r) for r in flat.collect())
    assert rows == [
        ("kota", 27.5, 80.0, "hujan"),
        ("kota", 29.0, 75.0, "berawan"),
        ("kota", 30.0, 70.0, "cerah"),
    ]


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S3/S9/S10 happy path against a REAL database: Apache Derby's
    embedded JDBC driver ships inside PySpark's jar directory (for the
    Hive metastore), so the JDBC source and both sink modes can be
    exercised end-to-end with zero extra dependencies — overwrite
    creates, append grows, read round-trips values. Derby uppercases
    unquoted identifiers; the reference normalizes serving-table columns
    to lower_snake_case on read, mirrored here."""
    from data_lakehouse_hygiene_spark.operators.cleaning import (
        normalize_columns,
    )
    from data_lakehouse_hygiene_spark.sinks import jdbc_write
    from data_lakehouse_hygiene_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1, "mandi"), (2, "olahraga")], "id int, nama string"
    )
    jdbc_write(df, url, "t_roundtrip", mode="overwrite", **props)
    jdbc_write(df, url, "t_roundtrip", mode="append", **props)
    back = normalize_columns(read_jdbc(spark, url, "t_roundtrip", properties=props))
    rows = sorted(tuple(r) for r in back.collect())
    assert back.columns == ["id", "nama"]
    assert rows == [(1, "mandi"), (1, "mandi"), (2, "olahraga"), (2, "olahraga")]


def test_http_json_happy_path_live_localhost(spark):
    """S1 happy path over a REAL http connection: a stdlib http.server on
    localhost serves the nested BMKG-shaped payload, fetch_json pulls it
    through the DEFAULT urllib transport (UA header, timeout,
    raise-on-non-2xx all on the live path), and dataframe_from_payload
    types it — the full source chain with no mock seams."""
    import http.server
    import json as _json
    import threading

    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    from data_lakehouse_hygiene_spark.sources import (
        dataframe_from_payload,
        fetch_json,
    )

    payload = {"status": "ok", "lokasi": "kota", "t": 27.5}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/weather.json":
                self.send_response(404)
                self.end_headers()
                return
            body = _json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        got = fetch_json(
            f"http://127.0.0.1:{port}/weather.json", status_field="status"
        )
        assert got == payload
        schema = StructType(
            [
                StructField("status", StringType()),
                StructField("lokasi", StringType()),
                StructField("t", DoubleType()),
            ]
        )
        df = dataframe_from_payload(spark, got, schema)
        assert [tuple(r) for r in df.collect()] == [("ok", "kota", 27.5)]
        # non-2xx raises on the same live path
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="HTTP 404"):
            fetch_json(f"http://127.0.0.1:{port}/missing.json")
    finally:
        srv.shutdown()
        srv.server_close()
