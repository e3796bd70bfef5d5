"""Common-Crawl-style pages table generator (BASELINE.json input_hint):
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Pure function of (seed, page id) via counter hashing → identical bytes at
any parallelism, so the table can be generated distributed with
``spark.range(n).mapInPandas`` at bench scale and in-process for unit
fixtures. ~70 % of pages carry an extractable coordinate (meta tag, text
pattern, or hostname hint); ~30 % are unresolvable and must survive as
nulls. Includes empty html, non-UTF8 bytes, duplicate coordinates,
points exactly on polygon edges (FIXTURES.md §1).

Coordinate skew: 40 % of resolvable pages cluster around the single hot
city — the London/Paris dense-cell analogue the skew machinery must
handle (SURVEY.md §7.4 risk 4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo import proj
from .geodata import AA_X0, AA_Y0, CITIES
from .hashing import h64, randint, uniform

LANGS = ["en", "de", "fr", "es", "it", "pl", "nl", "sv"]
HOSTS = [
    ("news.alpha.example", "alphaville"),
    ("blog.beta.example", "betatown"),
    ("shop.gamma.example", "gammaburg"),
    ("wiki.delta.example", "deltastadt"),
    ("forum.eps.example", None),
    ("mail.zeta.example", None),
    ("docs.eta.example", "etacity"),
    ("data.theta.example", "thetafield"),
    ("cdn.global.example", None),
    ("static.misc.example", None),
]
_CITY_BY_NAME = {c[0]: c for c in CITIES}
_HOT = [c for c in CITIES if c[4]][0]
_EDGE_POINTS = [
    (AA_X0 + 10_000.0, AA_Y0 + 5_000.0),  # exactly on a level-3 border
    (AA_X0 + 30_000.0, AA_Y0 + 20_000.0),  # 4-corner point of the grid
    (AA_X0, AA_Y0),  # country corner
]

_BASE_TS = np.datetime64("2024-01-01T00:00:00")

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _planar_coords(ids: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic page coordinates with hot-city skew."""
    u = uniform(ids, seed, 30)
    n = len(ids)
    x = np.empty(n)
    y = np.empty(n)
    hot = u < 0.40
    # hot cluster: tight 1.5 km jitter around the hot city
    x[hot] = _HOT[1] + (uniform(ids[hot], seed, 31) - 0.5) * 3_000.0
    y[hot] = _HOT[2] + (uniform(ids[hot], seed, 32) - 0.5) * 3_000.0
    # other cities: 8 km jitter
    rest = ~hot
    ci = randint(ids[rest], seed, 33, 0, len(CITIES))
    cx = np.array([c[1] for c in CITIES])[ci]
    cy = np.array([c[2] for c in CITIES])[ci]
    x[rest] = cx + (uniform(ids[rest], seed, 34) - 0.5) * 16_000.0
    y[rest] = cy + (uniform(ids[rest], seed, 35) - 0.5) * 16_000.0
    # a deterministic sliver lands exactly on polygon edges / vertices
    edge = uniform(ids, seed, 36) < 0.004
    eidx = randint(ids, seed, 37, 0, len(_EDGE_POINTS))
    for j, (ex, ey) in enumerate(_EDGE_POINTS):
        m = edge & (eidx == j)
        x[m] = ex
        y[m] = ey
    # ~1.5 % land outside every polygon (far north)
    out = uniform(ids, seed, 38) < 0.015
    x[out] = AA_X0 - 30_000.0 + uniform(ids[out], seed, 39) * 10_000.0
    y[out] = AA_Y0 + 60_000.0 + uniform(ids[out], seed, 40) * 10_000.0
    # duplicates: 2 % of pages reuse the exact coordinate of page id%97
    dup = uniform(ids, seed, 41) < 0.02
    if dup.any():
        base = (ids[dup] % np.uint64(97)).astype(np.uint64)
        x[dup] = _HOT[1] + (uniform(base, seed, 31) - 0.5) * 3_000.0
        y[dup] = _HOT[2] + (uniform(base, seed, 32) - 0.5) * 3_000.0
    return x, y


def pages_pandas(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate the pages batch for an array of int64 ids (pure)."""
    from ..extract.html import extract_text  # avoid cycle at import time

    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    hi = randint(ids, seed, 50, 0, len(HOSTS))
    lang_i = randint(ids, seed, 51, 0, len(LANGS))
    ts = _BASE_TS + (h64(ids, seed, 52) % np.uint64(30 * 86400)).astype(
        "timedelta64[s]"
    )
    x, y = _planar_coords(ids, seed)
    lon, lat = proj.inverse(x, y)
    lat = np.round(lat, 6)
    lon = np.round(lon, 6)

    mode = uniform(ids, seed, 53)  # resolvability mix
    # 0.00–0.42 meta tag | 0.42–0.63 text pattern | 0.63–0.70 host hint only
    # | 0.70–1.00 unresolvable
    empty = uniform(ids, seed, 54) < 0.02
    junk = uniform(ids, seed, 55) < 0.03

    urls = []
    htmls = []
    langs = []
    for k in range(n):
        pid = int(ids[k])
        host, _city = HOSTS[int(hi[k])]
        url = f"https://{host}/page/{pid}"
        if empty[k]:
            html = b""
        else:
            body = (
                f"<p>Synthetic page {pid} of host {host}.</p>"
                f"<p>Payload &amp; filler with id {pid * 2654435761 % 1000003}.</p>"
            )
            geo = ""
            m = mode[k]
            if m < 0.42:
                geo = f'<meta name="geo.position" content="{lat[k]};{lon[k]}">'
            elif m < 0.63:
                body += f"<p>coordinates: {lat[k]}, {lon[k]}</p>"
            # host-hint rows carry no inline coordinate at all
            html = (
                f"<html><head><title>page {pid}</title>{geo}"
                f"<script>var x = {pid};</script></head>"
                f"<body>{body}<!-- comment {pid} --></body></html>"
            ).encode("utf-8")
            if junk[k]:
                html += b"\xff\xfe\x00junk"
        urls.append(url)
        htmls.append(html)
        langs.append(LANGS[int(lang_i[k])])
    texts = [extract_text(h) for h in htmls]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def write_pages(spark, n: int, path: str, seed: int = 42, partitions: int = 32):
    """Distributed deterministic generation → parquet (bench scale).

    ``repartition(partitions)`` fixes the task count; values depend only
    on (seed, id) so output content is partitioning-independent.
    """

    def gen(batches):
        for b in batches:
            yield pages_pandas(b["id"].to_numpy(), seed)

    (
        spark.range(n, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )


def host_city_hints() -> pd.DataFrame:
    """hostname → city anchor lookup (the 'geo-resolved via hostnames'
    path in the north star). Planar anchor coords + lat/lon."""
    rows = []
    for host, city in HOSTS:
        if city is None:
            continue
        c = _CITY_BY_NAME[city]
        lon, lat = proj.inverse(np.array([c[1]]), np.array([c[2]]))
        rows.append(
            {"host": host, "city": city, "x": c[1], "y": c[2],
             "lat": float(np.round(lat[0], 6)), "lon": float(np.round(lon[0], 6))}
        )
    return pd.DataFrame(rows)
