"""Web/URL operators for crawl-corpus curation: URL canonicalization,
registered-domain (eTLD+1-style) extraction, and per-domain caps — the
dedup/skew controls a Common-Crawl-scale pipeline applies before any
text processing (same curation stage as the reference's per-source
filtering, ``src/data_engineering/config.json``; crawl-side analogue of
C4/CC-Net URL dedup).

All expressions are built-in ``pyspark.sql.functions`` regex/string ops
(JVM, whole-stage codegen, map-side) — the only shuffle in any operator
here is its final keyed aggregation/window. Each has an exact DuckDB
mirror in queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# mini public-suffix table: suffixes under which the registrable domain
# has THREE labels (a real deployment ships the full PSL as a broadcast
# lookup; the rule shape — longest-matching suffix — is identical)
MULTI_LABEL_SUFFIXES = ("co.uk", "ac.uk", "com.au", "co.jp")

_SUFFIX_ALT = "|".join(s.replace(".", r"\.") for s in MULTI_LABEL_SUFFIXES)
REGISTERED_DOMAIN_PATTERN = rf"([^.]+\.(?:{_SUFFIX_ALT})|[^.]+\.[^.]+)$"

# tracking params stripped by canonicalization (the utm_*/ref junk that
# makes byte-identical pages look like distinct URLs). The param name is
# ANCHORED to a preceding ?/& (kept via the capture group — RE2 has no
# lookbehind) so names merely ENDING in 'ref'/'utm_x' (href, xref) are
# never corrupted; the + quantifier consumes ADJACENT junk params in one
# match, since after '?utm_a=1&' is consumed a following 'ref=2' has no
# separator left to anchor on.
JUNK_PARAM_PATTERN = r"([?&])((?:utm_[a-z]+|ref)=[^&#]*&?)+"


def url_host(url: Column | str) -> Column:
    """Lowercased hostname: scheme and any ``user:pass@`` userinfo
    stripped, and the host ends at the first ``:`` (port), ``/``, ``?``
    or ``#`` — mirroring ``extract/html.py``'s ``_HOST_RE`` semantics,
    so ``example.com`` and ``example.com:80`` share one host (and one
    canonical-URL/domain key)."""
    u = F.col(url) if isinstance(url, str) else url
    s1 = F.regexp_replace(u, r"^https?://", "")
    return F.lower(F.regexp_extract(s1, r"^(?:[^/?#@]*@)?([^/:?#]+)", 1))


def url_canonical(url: Column | str) -> Column:
    """Canonical URL for dedup keys: drop scheme, lowercase host, strip
    userinfo and the port (``example.com`` ≡ ``example.com:80``), strip
    a leading www./m. subdomain, drop the fragment, remove tracking
    params (``utm_*``, ``ref``), trim dangling ``?``/``&`` and trailing
    slashes. Pure string expression — canonicalization is map-side and
    the dedup groupBy shuffles only the canonical key."""
    u = F.col(url) if isinstance(url, str) else url
    s1 = F.regexp_replace(u, r"^https?://", "")
    host = F.regexp_replace(url_host(s1), r"^(www|m)\.", "")
    rest = F.regexp_replace(s1, r"^[^/?#]+", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, JUNK_PARAM_PATTERN, "$1")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(host, rest)


def registered_domain(url: Column | str) -> Column:
    """Registrable domain (eTLD+1) of the URL's host under the mini
    suffix table: 3 labels under MULTI_LABEL_SUFFIXES, else 2."""
    return F.regexp_extract(url_host(url), REGISTERED_DOMAIN_PATTERN, 1)


def url_dedup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Exact dedup by canonical URL: one row per canonical key with the
    variant count, the canonical representative (min doc_id), and the
    number of DISTINCT raw spellings collapsed. One shuffle on the
    canonical key."""
    return (
        pages.withColumn("canonical_url", url_canonical(url_col))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.min("doc_id").alias("canonical_doc"),
            F.countDistinct(url_col).alias("n_spellings"),
        )
    )


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain corpus report: doc and distinct-host
    counts plus mean text length — the skew map that decides which
    domains need capping/salting. One shuffle on the domain key."""
    return (
        pages.withColumn("domain", registered_domain(url_col))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(url_host(url_col)).alias("n_hosts"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
    )


def domain_rank_flags(pages: DataFrame, k: int, url_col: str = "url") -> DataFrame:
    """Audit variant of the hot-domain cap: EVERY row comes back with
    its within-domain rank (length desc, doc_id tie-break) and a
    ``kept`` flag. Because all rows are emitted, each domain's full row
    set flows through the window sort — use ``cap_per_domain`` for the
    actual skew control; this form is for cap-effect reporting."""
    w = Window.partitionBy("domain").orderBy(
        F.desc(F.length("text")), F.asc("doc_id")
    )
    return (
        pages.withColumn("domain", registered_domain(url_col))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("kept", F.col("rk") <= k)
    )


def cap_per_domain(pages: DataFrame, k: int, url_col: str = "url") -> DataFrame:
    """Hot-domain cap: keep at most ``k`` docs per registered domain,
    preferring longer documents (rank by length desc, doc_id as the
    deterministic tie-break). The standard crawl-skew control — a
    single analytic window per domain partition, and because the
    ``rk <= k`` filter is applied HERE, Spark's InferWindowGroupLimit
    pushes a partial limit below the exchange (plan-asserted), so no
    hot domain's full row set is ever buffered through the sort."""
    return domain_rank_flags(pages, k, url_col).filter(F.col("rk") <= k).drop(
        "kept"
    )
