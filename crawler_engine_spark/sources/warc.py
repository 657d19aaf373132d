"""WARC ingestion (Common Crawl's container format) — the canonical
100 TB web-corpus source, parsed stdlib-only (no warcio in the container,
and none needed: WARC/1.0 is a plain framed text format, ISO 28500).

Supported subset, which is exactly what Common Crawl emits:

* WARC/1.0 records framed by a header block (``\\r\\n``-separated fields,
  terminated by a blank line) + ``Content-Length`` octets of body + a
  ``\\r\\n\\r\\n`` separator;
* ``response`` records whose body is an HTTP/1.x response — the HTML
  payload starts after the HTTP header block;
* plain ``.warc`` and member-wise-gzipped ``.warc.gz`` (each record its
  own gzip member, the Common Crawl layout — stdlib ``zlib`` with a
  fresh ``decompressobj`` per member walks the concatenation).

Scale shape: files load via Spark's ``binaryFile`` datasource (one row
per archive; CC segment archives are ~1 GB — size executors for one
archive per task, or pre-split archives / drive reads from the CDX
offset index for finer parallelism) and parse in an Arrow-batched
``mapInPandas`` that streams record-by-record, so peak Python memory
beyond the input row is one record.  The Python kernel is justified the
same way as extraction: there is no JVM operator for WARC framing, and
the per-record work is byte-slicing, not row-at-a-time Python objects.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

WARC_PAGE_SCHEMA = (
    "url string, warc_ts string, http_status int, html binary, "
    "warc_path string"
)


# --------------------------------------------------------------------------
# pure-Python framing kernel (unit-testable without Spark)
# --------------------------------------------------------------------------


def _split_gzip_members(raw: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time.
    A truncated or corrupt member ends iteration at the last whole one —
    the gzip twin of the plain path's stop-at-last-whole-record rule
    (truncated segment downloads are a fact of life at archive scale)."""
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            member = d.decompress(raw[pos:])
        except zlib.error:
            return
        if not d.eof:  # ran out of input mid-member
            return
        yield member
        tail = d.unused_data
        if not tail:
            return
        pos = len(raw) - len(tail)


def _parse_records(buf: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield (warc_headers, body) for each record in an uncompressed
    WARC byte stream.  Malformed framing stops iteration at the last
    whole record instead of guessing."""
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while buf.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            return
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers: dict = {}
        for line in buf[pos:head_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        if body_start + length > n:
            return
        yield headers, buf[body_start : body_start + length]
        pos = body_start + length


def _split_http_response(body: bytes) -> Tuple[Optional[int], bytes]:
    """(status_code, payload) from an HTTP/1.x response body; a body
    without an HTTP header block is returned whole with status None."""
    if not body.startswith(b"HTTP/"):
        return None, body
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0:
        return None, body
    status_line = body[: body.find(b"\r\n")].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    return status, body[head_end + 4 :]


def iter_response_pages(raw: bytes) -> Iterator[Tuple[str, str, Optional[int], bytes]]:
    """(url, warc_ts, http_status, payload) for every ``response`` record
    in a .warc / .warc.gz byte string."""
    streams = (
        _split_gzip_members(raw) if raw[:2] == b"\x1f\x8b" else iter((raw,))
    )
    for stream in streams:
        for headers, body in _parse_records(stream):
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri")
            if not url:
                continue
            status, payload = _split_http_response(body)
            yield url, headers.get("warc-date", ""), status, payload


def build_warc(
    records: List[Tuple[str, str, bytes]],
    gzip_members: bool = False,
    compresslevel: int = 6,
) -> bytes:
    """Serialize (url, warc_ts, payload) triples as WARC/1.0 response
    records (deterministic; the test/world-gen twin of the parser)."""
    out = []
    for url, ts, payload in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\nContent-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        rec = head + http + b"\r\n\r\n"
        # mtime=0 keeps the member bytes deterministic across runs
        out.append(
            gzip.compress(rec, compresslevel, mtime=0) if gzip_members else rec
        )
    return b"".join(out)


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------


def warc_response_pages(files: DataFrame, path_col: str = "path",
                        content_col: str = "content") -> DataFrame:
    """(path, content) rows of .warc/.warc.gz bytes → one row per HTTP
    response record: ``WARC_PAGE_SCHEMA``.  Feed the output straight into
    ``extract_pages`` (url + html contract) or a frontier page store."""
    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, raw in zip(pdf[path_col], pdf[content_col]):
                for url, ts, status, payload in iter_response_pages(bytes(raw)):
                    rows.append((url, ts, status, payload, path))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "http_status", "html", "warc_path"],
            )

    return files.mapInPandas(parse, WARC_PAGE_SCHEMA)


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc(.gz) files → response-page DataFrame via
    the binaryFile datasource (see module docstring for the archive-size
    sizing note)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return warc_response_pages(files)
