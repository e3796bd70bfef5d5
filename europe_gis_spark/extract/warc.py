"""WARC (ISO 28500) codec — Common Crawl's container format, vendored.

The engine's input contract is a Common-Crawl-style page table
(``url, warc_ts, html, text, lang``; BASELINE.json input_hint), and
Common Crawl ships that data as WARC: concatenated records, each
record gzipped as its OWN member so a reader can seek to a record
offset and inflate just that member. This module owns both directions
with stdlib only (``gzip``/``zlib``) — same vendoring rationale as the
BMP/WAV/PNG codecs in ``operators/multimodal.py`` and the HTML
extractor in ``extract/html.py`` (reference analogue: raw
``struct.unpack`` decode in
``/root/reference/scripts/old_files/build_dem.py:63-79``): library
drift cannot break byte-identical goldens.

Scale shape: one WARC segment (a ``.warc.gz`` blob, typically ~1 GB in
Common Crawl) is one unit of work. ``spark.read.format("binaryFile")``
gives (path, content) rows; record splitting, HTTP-envelope stripping
and header parsing all happen executor-side inside one Arrow batch
pass (``mapInPandas``) — the driver never sees payload bytes, and a
100 TB crawl is just more segment rows. Parsing is Content-Length
framed (never regex-over-payload), so adversarial page bytes cannot
desynchronise the splitter.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterable, Iterator

import pandas as pd

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

# -------------------------------------------------------------------------
# record build / segment write (deterministic: no clocks, no uuids)


def build_record(url: str, warc_date: str, payload: bytes) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 envelope.

    ``warc_date`` is the ISO-8601 ``WARC-Date`` string; the record id is
    a deterministic digest of (url, date, payload) so identical inputs
    build byte-identical records (golden-test requirement — Common
    Crawl's uuid4 ids are the one field we pin down).
    """
    rid = hashlib.sha256(
        url.encode() + b"\x00" + warc_date.encode() + b"\x00" + payload
    ).hexdigest()[:32]
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=UTF-8" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
        + payload
    )
    head = (
        WARC_VERSION + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + warc_date.encode() + _CRLF
        + b"WARC-Record-ID: <urn:sha256:" + rid.encode() + b">" + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def write_segment(records: Iterable[bytes], compress: bool = True) -> bytes:
    """Concatenate records into one segment blob.

    ``compress=True`` gzips each record as its own member (Common
    Crawl's layout — members are independently inflatable);
    ``mtime=0`` keeps the gzip header deterministic.
    """
    if not compress:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec, mtime=0))
    return out.getvalue()


# -------------------------------------------------------------------------
# parse

def _inflate(data: bytes) -> bytes:
    """Inflate a (possibly multi-member) gzip blob; pass through raw."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)  # stdlib handles member concatenation
    return data


def parse_segment(data: bytes) -> list[dict]:
    """Split a segment into records → list of header+payload dicts.

    Framing is strictly ``Content-Length``-driven per the spec: read
    the header block up to the blank line, take exactly that many body
    bytes, then skip the two-CRLF record separator. For ``response``
    records the HTTP envelope is stripped (payload = bytes after the
    first blank line of the HTTP block); other record types
    (warcinfo/request/metadata) are surfaced with their raw body so a
    caller can filter on ``warc_type``.
    """
    data = _inflate(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 4] == b"\r\n\r\n":  # inter-record separator
            pos += 4
            continue
        if not data[pos:].startswith(b"WARC/"):
            raise ValueError(f"WARC: bad record start at offset {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode().strip().lower()] = v.decode("utf-8", "replace").strip()
        body_len = int(headers["content-length"])
        body = data[hdr_end + 4 : hdr_end + 4 + body_len]
        if len(body) != body_len:
            raise ValueError("WARC: truncated record body")
        pos = hdr_end + 4 + body_len
        wtype = headers.get("warc-type", "")
        payload = body
        http_status = None
        if wtype == "response" and body[:5] == b"HTTP/":
            split = body.find(b"\r\n\r\n")
            if split >= 0:
                status_line = body[: body.index(_CRLF)]
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    http_status = int(parts[1])
                payload = body[split + 4 :]
        out.append(
            {
                "warc_type": wtype,
                "url": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id"),
                "http_status": http_status,
                "payload": payload,
            }
        )
    return out


# -------------------------------------------------------------------------
# Spark surface

RECORD_SCHEMA = (
    "segment string, warc_type string, url string, warc_date string, "
    "http_status int, payload binary"
)


def records_batches(
    batches: Iterator[pd.DataFrame],
    segment_col: str = "segment",
    blob_col: str = "warc",
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (segment id, warc blob) rows → record rows."""
    for pdf in batches:
        rows = []
        for seg, blob in zip(pdf[segment_col], pdf[blob_col]):
            for rec in parse_segment(bytes(blob)):
                rows.append(
                    (
                        seg,
                        rec["warc_type"],
                        rec["url"],
                        rec["warc_date"],
                        rec["http_status"],
                        rec["payload"],
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "segment",
                "warc_type",
                "url",
                "warc_date",
                "http_status",
                "payload",
            ],
        )


def read_warc(spark, path: str):
    """``.warc``/``.warc.gz`` files → record DataFrame.

    ``binaryFile`` yields one row per segment file; splitting happens
    executor-side. At crawl scale segments are ~1 GB and the 2 GB
    binaryFile row cap is the real constraint — matching Common
    Crawl's own segment sizing.
    """
    blobs = (
        spark.read.format("binaryFile")
        .load(path)
        .selectExpr("path AS segment", "content AS warc")
    )
    return blobs.mapInPandas(records_batches, schema=RECORD_SCHEMA)


def pages_from_warc(spark, path: str):
    """WARC segments → the engine's canonical page-table shape
    (url, warc_ts, html) — the BASELINE.json input_hint contract;
    ``text``/``lang`` attach downstream via ``extract.html``."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path)
    return recs.filter(F.col("warc_type") == "response").select(
        "url",
        F.to_timestamp("warc_date").alias("warc_ts"),
        F.col("payload").alias("html"),
    )
