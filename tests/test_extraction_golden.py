"""Golden byte-identity tests for HTML text extraction (the per-row
invariant from BASELINE.json input_hint: byte-identical extracted text
per url, frozen via sha256 — SURVEY.md §7.4 risk 1)."""

import hashlib

import numpy as np

from europe_gis_spark.datagen import pages as pgen
from europe_gis_spark.extract.html import extract_coords, extract_host, extract_text

# frozen digest of '\n'.join(f'{url}\t{sha256(text_utf8)}') for seed=42
# ids 0..499 — regenerate ONLY on a deliberate EXTRACTOR_VERSION bump
GOLDEN_CORPUS_SHA = None  # set below on first freeze


def corpus_digest(n=500, seed=42) -> str:
    df = pgen.pages_pandas(np.arange(n), seed=seed)
    lines = [
        f"{u}\t{hashlib.sha256(t.encode('utf-8')).hexdigest()}"
        for u, t in zip(df.url, df.text)
    ]
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


# re-frozen after the deliberate PROJECTION version bump (spherical →
# true ellipsoidal EPSG:3035 LAEA): datagen page texts embed lat/lon
# from proj.inverse, so the corpus bytes legitimately changed once
FROZEN = "6e24fd2cf5c2e39cc73f610d5a102f7f3a2afe2aeeb53c97612db7d87bb2b09f"


def test_text_column_equals_extraction():
    df = pgen.pages_pandas(np.arange(300), seed=42)
    for h, t in zip(df.html, df.text):
        assert extract_text(h) == t


def test_extraction_pure_and_stable():
    cases = [
        b"",
        b"<html><body>hi</body></html>",
        b"<p>a&amp;b</p><script>x<1</script>",
        b"\xff\xfe broken <b>bytes</b>",
        b"<!-- c --><style>p{}</style>text  with\nspaces",
    ]
    for c in cases:
        assert extract_text(c) == extract_text(bytes(c))
    assert extract_text(b"<p>a&amp;b</p>") == "a&b"
    assert extract_text(b"<!-- x --><i>y</i>") == "y"


def test_coord_and_host_extraction():
    html = b'<meta name="geo.position" content="48.85;2.35"><p>x</p>'
    assert extract_coords(html, "x") == (48.85, 2.35)
    assert extract_coords(b"", "see coordinates: -12.5, 44.25 here") == (-12.5, 44.25)
    assert extract_coords(b"<p>none</p>", "no coords") is None
    assert extract_host("https://news.alpha.example/page/1") == "news.alpha.example"
    assert extract_host("not a url") is None


def test_golden_corpus_frozen():
    got = corpus_digest()
    assert got == FROZEN, (
        f"extracted-text corpus digest changed: {got} — if the extractor "
        "changed deliberately, bump EXTRACTOR_VERSION and refreeze"
    )
