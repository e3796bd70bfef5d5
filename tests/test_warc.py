"""WARC codec (extract/warc.py): framing, gzip member layout, golden
bytes, and the Spark binaryFile → mapInPandas ingest surface."""

import gzip
import hashlib

import pytest

from europe_gis_spark.extract.warc import (
    build_record,
    pages_from_warc,
    parse_segment,
    read_warc,
    write_segment,
)

DATE = "2024-01-01T00:00:00Z"


def _payloads():
    return [
        b"<html><body>hello</body></html>",
        b"",  # empty body
        # adversarial: payload embeds CRLFCRLF + a fake record start —
        # Content-Length framing must not desynchronise
        b"\xff\xfe raw \r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake",
    ]


def _segment(compress=True):
    recs = [
        build_record(f"https://e.org/{i}", DATE, p)
        for i, p in enumerate(_payloads())
    ]
    return write_segment(recs, compress=compress)


def test_roundtrip_payloads_byte_identical():
    for compress in (True, False):
        out = parse_segment(_segment(compress))
        assert [r["payload"] for r in out] == _payloads()
        assert [r["url"] for r in out] == [f"https://e.org/{i}" for i in range(3)]
        assert all(r["http_status"] == 200 for r in out)
        assert all(r["warc_type"] == "response" for r in out)
        assert all(r["warc_date"] == DATE for r in out)


def test_deterministic_golden_bytes():
    """Same inputs → byte-identical segment (mtime=0, digest record id);
    golden sha256 pins the full record+envelope layout."""
    seg1, seg2 = _segment(), _segment()
    assert seg1 == seg2
    assert (
        hashlib.sha256(seg1).hexdigest()
        == "c6f63cffc2220775d642b05e681ba6df42dfa330b14c4ac93e5c0cd78691a9e6"
    )


def test_gzip_member_per_record_independently_inflatable():
    """Common Crawl's seek-to-offset contract: each record is its own
    gzip member, so inflating a single member yields a whole record."""
    seg = _segment()
    # gzip magic at every member boundary
    offsets = [i for i in range(len(seg) - 1) if seg[i : i + 2] == b"\x1f\x8b"]
    # magic bytes can occur inside deflate streams; decode members greedily
    import zlib

    members = []
    pos = 0
    while pos < len(seg):
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(seg[pos:]))
        pos = len(seg) - len(d.unused_data)
    assert len(members) == 3
    assert offsets[0] == 0
    one = parse_segment(members[1])
    assert len(one) == 1 and one[0]["payload"] == b""


def test_truncated_record_raises():
    raw = _segment(compress=False)
    with pytest.raises(ValueError, match="truncated"):
        parse_segment(raw[:-10])


def test_bad_start_raises():
    with pytest.raises(ValueError, match="bad record start"):
        parse_segment(b"HTTP/1.1 200 OK\r\n\r\n")


def test_non_response_records_pass_through():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"info body\r\n\r\n"
    )
    rec = build_record("https://e.org/x", DATE, b"<p>x</p>")
    out = parse_segment(write_segment([info, rec]))
    assert [r["warc_type"] for r in out] == ["warcinfo", "response"]
    assert out[0]["payload"] == b"info body"
    assert out[0]["http_status"] is None


def test_spark_ingest_binaryfile(spark, tmp_path):
    """binaryFile → mapInPandas split → canonical page-table shape,
    html byte-identical per url across two segment files."""
    want = {}
    for s in range(2):
        recs = []
        for i in range(5):
            url = f"https://e.org/s{s}/p{i}"
            payload = f"<html><body>seg {s} page {i}</body></html>".encode()
            want[url] = payload
            recs.append(build_record(url, DATE, payload))
        (tmp_path / f"seg{s}.warc.gz").write_bytes(write_segment(recs))

    recs_df = read_warc(spark, str(tmp_path))
    assert recs_df.count() == 10
    pages = pages_from_warc(spark, str(tmp_path)).toPandas()
    assert len(pages) == 10
    got = {r.url: bytes(r.html) for r in pages.itertuples()}
    assert got == want
    assert pages["warc_ts"].notna().all()
