"""WARC ingestion: framing round-trips (plain + member-gzip), record-type
filtering, truncation safety, and the Spark surface feeding extraction."""

import gzip

from crawler_engine_spark.sources.warc import (
    build_warc,
    iter_response_pages,
    read_warc_pages,
    warc_response_pages,
)

_TS = "2026-01-01T00:00:00Z"


def _recs(n=3):
    return [
        (f"https://w.example/p{i}", _TS, f"<html><body>doc {i}</body></html>".encode())
        for i in range(n)
    ]


def test_warc_roundtrip_plain_and_gzip():
    recs = _recs()
    for gz in (False, True):
        got = list(iter_response_pages(build_warc(recs, gzip_members=gz)))
        assert [(u, t, p) for u, t, _, p in got] == recs
        assert all(status == 200 for _, _, status, _ in got)


def test_warc_skips_non_response_records():
    info_body = "望b".encode()  # 4 bytes; non-ascii must not confuse framing
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        + f"Content-Length: {len(info_body)}\r\n\r\n".encode()
        + info_body + b"\r\n\r\n"
    )
    # request record for the same URI — must also be skipped
    req_body = b"GET /p0 HTTP/1.1\r\nHost: w.example\r\n\r\n"
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://w.example/p0\r\n"
        + f"Content-Length: {len(req_body)}\r\n\r\n".encode()
        + req_body + b"\r\n\r\n"
    )
    blob = info + req + build_warc(_recs(1))
    got = list(iter_response_pages(blob))
    assert len(got) == 1 and got[0][0] == "https://w.example/p0"
    assert got[0][3] == b"<html><body>doc 0</body></html>"


def test_warc_truncation_stops_at_last_whole_record():
    blob = build_warc(_recs(2))
    # cut into the middle of the second record's body
    cut = blob[: len(build_warc(_recs(1))) + 40]
    got = list(iter_response_pages(cut))
    assert [u for u, *_ in got] == ["https://w.example/p0"]
    # garbage tail after a whole record also stops cleanly
    got = list(iter_response_pages(build_warc(_recs(1)) + b"\x00garbage"))
    assert len(got) == 1
    # gzip path: a truncated final member yields only the whole members
    gz = build_warc(_recs(2), gzip_members=True)
    first_len = len(build_warc(_recs(1), gzip_members=True))
    got = list(iter_response_pages(gz[: first_len + 10]))
    assert [u for u, *_ in got] == ["https://w.example/p0"]
    # corrupt bytes inside the second member stop after the first
    corrupt = bytearray(gz)
    corrupt[first_len + 12] ^= 0xFF
    got = list(iter_response_pages(bytes(corrupt)))
    assert [u for u, *_ in got] == ["https://w.example/p0"]


def test_warc_body_without_http_headers_kept_whole():
    raw = b"raw payload, no HTTP header block"
    blob = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://w.example/raw\r\n"
        + f"Content-Length: {len(raw)}\r\n\r\n".encode()
        + raw + b"\r\n\r\n"
    )
    ((url, _, status, payload),) = list(iter_response_pages(blob))
    assert url == "https://w.example/raw"
    assert status is None and payload == raw


def test_warc_spark_surface_feeds_extraction(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawler_engine_spark.operators.extraction import extract_pages

    body = (
        b"<html><body><p>Enough prose content for the extractor to call "
        b"this a real page with words words words words words words words "
        b'words.</p><a href="https://w.example/next">next</a></body></html>'
    )
    recs = [(f"https://w.example/p{i}", _TS, body) for i in range(4)]
    (tmp_path / "a.warc.gz").write_bytes(build_warc(recs[:2], gzip_members=True))
    (tmp_path / "b.warc").write_bytes(build_warc(recs[2:]))

    pages = read_warc_pages(spark, str(tmp_path))
    rows = sorted(r["url"] for r in pages.collect())
    assert rows == sorted(u for u, _, _ in recs)
    assert pages.schema["html"].dataType.typeName() == "binary"

    res = extract_pages(pages.select("url", "html"), mode="adaptive")
    ok = res.where("success").select("url", F.size("out_links").alias("n"))
    assert all(r["n"] == 1 for r in ok.collect())
    assert ok.count() == 4
